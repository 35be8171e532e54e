"""End-to-end DAGs: the flagship KG-construction pipeline."""
