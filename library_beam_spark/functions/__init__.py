"""Column-level functions (the engine's scalar-function surface, SURVEY §2.7).

Everything here returns a ``pyspark.sql.Column`` built from built-in
expressions wherever possible — JVM-side, codegen-friendly, UDF-free.
Pandas UDFs appear only where no built-in exists (ASCII folding) and are
clearly marked.
"""
