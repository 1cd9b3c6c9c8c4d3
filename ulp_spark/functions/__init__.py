"""Scalar-function layer: type sniffing, lattice codes, casts, sanitization,
route templates.  Everything here returns Column expressions (JVM-side,
whole-stage-codegen) except the two genuinely Python-bound quirks (IPv6
canonicalization), which are Arrow-batched pandas UDFs.
"""

from ulp_spark.functions import casts, routes, sanitize, sniff  # noqa: F401
