"""PySpark-native analytics + CDC engine with the capabilities of
jistok/greenplum-cdc (see SURVEY.md).

Everything is declarative DataFrame/SQL so Catalyst/Tungsten pick the
physical strategy; Python UDFs appear only in the multimodal stubs.
"""

__version__ = "0.1.0"
