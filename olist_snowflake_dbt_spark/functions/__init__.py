"""Column-level function library: vector math, text normalization, hashing.

Everything here returns Catalyst Column expressions (JVM-side, codegen'd)
— no Python UDFs in the hot path.
"""
