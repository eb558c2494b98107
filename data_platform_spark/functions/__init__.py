"""Column-expression libraries for the LLM-data-pipeline extension surface:
text analysis, deduplication, similarity search. All hot-path expressions
are built-in `pyspark.sql.functions` / SQL lambda expressions (JVM-side,
whole-stage-codegen eligible); Python touches data only in clearly-marked
Pandas-UDF fallbacks (simhash bit-packing, multimodal decode stubs).
"""
