"""PySpark-native analytics + CDC engine with the capabilities of
jistok/greenplum-cdc (see SURVEY.md).

Everything is declarative DataFrame/SQL so Catalyst/Tungsten pick the
physical strategy; Python UDFs appear only in the multimodal stubs.
"""

__version__ = "0.1.0"

# Wire the protobuf bridge (vendor/google) BEFORE any SparkSession can
# exist: transformWithState's python workers inherit PYTHONPATH from
# the JVM, and the JVM inherits this process env at launch — so the
# env edit must precede session creation (see vendor/protobuf_shim.py).
from .vendor import ensure_protobuf as _ensure_protobuf

_ensure_protobuf()
