"""Column-level function libraries: text, vectors, hashing.

Everything here returns Column expressions built from pyspark.sql.functions
(JVM-side, codegen'd) — Python/Pandas UDFs appear only where built-ins
genuinely cannot express the semantics, and are marked as such.
"""
