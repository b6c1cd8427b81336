"""CKAN catalog JSON → dataset metadata (S9, SURVEY.md §2.1).

Twin of the reference's datahub.io metadata crawler
(/root/reference/src/main/java/metadata_crawler/Metadata.java:41-212): parse
``package_show`` JSON payloads into dataset rows — title, notes, tags,
groups — and select the SPARQL endpoint from the package's resources the way
the reference does (a resource whose format/description mentions SPARQL,
Metadata.java:195-211). All parsing is ``from_json`` + array functions —
JVM-side, schema-checked, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CKAN_PACKAGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("notes", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StructType([T.StructField("name", T.StringType())]))),
        T.StructField(
            "groups", T.ArrayType(T.StructType([T.StructField("name", T.StringType())]))
        ),
        T.StructField(
            "resources",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("url", T.StringType()),
                        T.StructField("format", T.StringType()),
                        T.StructField("description", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def _sparql_endpoint(resources: Column) -> Column:
    """First resource whose format/description mentions SPARQL
    (Metadata.java:195-211's contains-check, case-insensitive)."""
    hits = F.filter(
        resources,
        lambda r: F.upper(F.coalesce(r["format"], F.lit(""))).contains("SPARQL")
        | F.upper(F.coalesce(r["description"], F.lit(""))).contains("SPARQL"),
    )
    return F.when(F.size(hits) > 0, F.element_at(hits, 1)["url"])


def parse_ckan_packages(payloads: DataFrame, json_col: str = "payload") -> DataFrame:
    """(…, payload:string of package_show JSON) → dataset metadata rows:
    (dataset_id, name, title, description, tags, groups, endpoint_url,
    has_sparql_endpoint)."""
    pkg = F.from_json(F.col(json_col), CKAN_PACKAGE_SCHEMA)
    names = lambda arr: F.transform(  # noqa: E731
        F.coalesce(arr, F.array()), lambda x: x["name"]
    )
    return payloads.select(
        pkg["id"].alias("dataset_id"),
        pkg["name"].alias("name"),
        pkg["title"].alias("title"),
        pkg["notes"].alias("description"),
        names(pkg["tags"]).alias("tags"),
        names(pkg["groups"]).alias("groups"),
        _sparql_endpoint(F.coalesce(pkg["resources"], F.array())).alias("endpoint_url"),
    ).withColumn("has_sparql_endpoint", F.col("endpoint_url").isNotNull())


def publication_content_filter(datasets: DataFrame, needle: str) -> DataFrame:
    """Tag/group substring filter — Dataset.isPublicationContent
    (entities/Dataset.java:45-61): keep datasets whose tags OR groups contain
    the needle as a substring."""
    has = lambda col: F.exists(col, lambda x: x.contains(needle))  # noqa: E731
    return datasets.where(has(F.col("tags")) | has(F.col("groups")))
