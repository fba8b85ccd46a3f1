"""Sources: parquet/CSV/JSON attribute loaders, streaming datoms
(file, TCP socket, Kafka projection), engine introspection."""
