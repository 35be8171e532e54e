"""Pure operator semantics (no Spark imports).

Every function here is deterministic, side-effect free, and usable
both from pytest and from inside Arrow-batched pandas UDFs. Reference
parity citations point into /root/reference (file:line).
"""
