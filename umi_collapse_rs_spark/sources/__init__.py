from umi_collapse_rs_spark.sources.pages import (  # noqa: F401
    PAGES_SCHEMA,
    read_pages,
    write_table,
)
