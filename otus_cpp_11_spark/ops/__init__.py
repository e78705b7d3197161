"""Library-level operators that are not pure Column expressions: multimodal
binary-column processing (Pandas-UDF / mapInPandas plumbing). Query-facing
registrations live in ``otus_cpp_11_spark.queries``; these modules hold the
reusable implementations and their stubs."""
