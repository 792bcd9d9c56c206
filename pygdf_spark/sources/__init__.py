from pygdf_spark.sources.io import (  # noqa: F401
    read_avro,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
)
