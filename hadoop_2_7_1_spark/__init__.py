"""hadoop_2_7_1_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Apache Hadoop 2.7.1's MapReduce surface
(reference studied read-only at /root/reference; semantics only, no code).

Architecture: DataFrame-first. The MapReduce programming model (map →
partition/sort/shuffle → group → reduce) is re-expressed as declarative
DataFrame plans so Catalyst/Tungsten choose the physical strategy; Python
touches data only through Arrow-batched Pandas UDFs where built-ins cannot
express the semantics (pipe UDFs, compute-parallel kernels, multimodal decode).

Layout:
  session     SparkSession factory tuned for local testing / cluster scale
  io          table loaders, format dispatch, partitioned/multi-sink writers
  kv          KVDataset facade: MR-shaped verbs over DataFrames
  functions   shared column expressions (tokenize, hex hashes, shingles)
  operators   joins, aggregates, field selection, partitioning, set ops,
              dedup, similarity, text analysis, multimodal plumbing
  plans       Pipeline DAG runner (JobControl analogue)
  streaming   Structured Streaming layer (windows, watermark, stateful dedup)
  queries     the declared query suite (SURVEY.md §2) + oracle SQL registry
"""

__version__ = "0.1.0"
