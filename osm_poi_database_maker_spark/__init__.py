"""osm_poi_database_maker_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``mvexel/osm-poi-database-maker`` pipeline (see ``SURVEY.md``): tag-based
filtering, dimension semi-joins, hstore/geometry codecs, bulk sinks, plus a
set of large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) designed Spark-first for
100 TB-class clusters.

Layout:
    session    -- SparkSession factory tuned for local[N] and cluster use
    io         -- fixture loaders / table registry over parquet
    settings   -- engine configuration (mirrors reference settings surface)
    ops/       -- relational + tag-semantics operator library
    geo        -- WKB / geodesic geometry kernel (pure PySpark + pandas UDF)
    pipeline   -- the end-to-end POI ETL DAG
    sink       -- JDBC / COPY / dead-letter sinks
    dedup      -- exact + near-duplicate detection
    similarity -- embedding similarity search
    text       -- text analysis (lang-id, quality, tokens, fingerprints)
    streaming  -- Structured Streaming variants
"""

__version__ = "0.1.0"
