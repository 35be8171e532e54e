"""Sources & sinks: reference corpus formats, synthetic page tables."""
