"""pulsar_sync_java_spark — a PySpark-native engine with the query and
data-processing capabilities of shoothzj/pulsar-sync-java.

The reference (read-only at /root/reference) is a Pulsar->Pulsar cluster
replication tool: a control plane that diffs two catalogs (tenants /
namespaces / topics) and an always-on data plane that replicates messages
and translates consumer cursors.  This engine re-expresses those semantics
Spark-first:

- batch/relational layer  -> DataFrame/SQL (catalog diff, cursor
  translation, message-table analytics), oracle-checked against DuckDB;
- streaming layer         -> Structured Streaming (message replication,
  windowed sampling, stateful TTL maps);
- LLM-data-pipeline layer -> dedup, similarity search, text analysis,
  multimodal plumbing over the documents/embeddings tables.

Nothing in this package is translated from the reference's Java; citations
in docstrings (file:line relative to /root/reference) mark which reference
*behavior* each component reproduces.
"""

from pulsar_sync_java_spark.session import get_spark
from pulsar_sync_java_spark.sources.tables import TABLES, load_table, register_views

__all__ = ["get_spark", "TABLES", "load_table", "register_views"]
