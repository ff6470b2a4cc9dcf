from gofaiss_spark.sources.readers import (
    TABLES,
    load_embeddings_as_vectors,
    load_events,
    load_query_vectors,
    load_table,
    read_embedding_csv,
    read_pipe_delimited_metadata,
)

__all__ = [
    "TABLES",
    "load_embeddings_as_vectors",
    "load_events",
    "load_query_vectors",
    "load_table",
    "read_embedding_csv",
    "read_pipe_delimited_metadata",
]
