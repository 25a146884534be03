"""Operator library (SURVEY.md §2).

Each module re-expresses one family of the reference's ~90 MapReduce library
operators as declarative DataFrame transformations:

  aggregates     ValueAggregator registry, ValueHistogram, exact median
  fieldsel       FieldSelectionMapper/Helper ("cut"-style field specs)
  keyfield       KeyFieldBasedComparator/Partitioner (Unix sort -k specs)
  partitioning   total-order sort + scalable global rank (TotalOrderPartitioner)
  joins          inner/outer/override/semi/anti + broadcast helpers
  setops         union/intersect/except
  secondary_sort grouping-comparator ≠ sort-comparator semantics
  pipes          Hadoop Streaming pipe UDFs (subprocess line protocol)
  dedup          exact, MinHash-LSH, SimHash, n-gram Jaccard near-dup
  similarity     brute-force + IVF-bucketed cosine top-k over embeddings
  textops        language-ID, quality scoring, token counts, fingerprints
  multimodal     binary column decode/feature plumbing (Arrow-batched)
"""
