"""Exception taxonomy, mirroring the reference's error mapping
(reference: connections.py:236-258 — ProgrammingError -> DbtDatabaseError,
connection failure -> FailedToConnectError, anything else -> DbtRuntimeError;
asserted by reference tests/units/test_adapter.py:87-108).
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for all engine errors."""


class DatabaseError(EngineError):
    """A statement failed to parse/analyze/execute (analog of DbtDatabaseError)."""


class FailedToConnectError(EngineError):
    """The SparkSession could not be created / is stopped."""


class RuntimeEngineError(EngineError):
    """Any other engine failure (analog of DbtRuntimeError)."""


class CompilationError(EngineError):
    """Bad model config / unsupported argument (analog of dbt CompilationError),
    e.g. unsupported datepart (reference: utils/datediff.sql:26) or >10k columns
    (reference: macros/adapters.sql:12-19)."""


def map_exception(exc: Exception) -> EngineError:
    """Classify an arbitrary exception into the taxonomy (reference:
    connections.py:236-258). AnalysisException/ParseException -> DatabaseError;
    stopped-session / py4j connection issues -> FailedToConnectError; else
    RuntimeEngineError."""
    try:
        from pyspark.errors import AnalysisException, ParseException, IllegalArgumentException

        if isinstance(exc, (AnalysisException, ParseException, IllegalArgumentException)):
            return DatabaseError(str(exc))
    except ImportError:
        pass
    msg = str(exc)
    if "SparkContext" in msg and ("stopped" in msg or "shut down" in msg):
        return FailedToConnectError(msg)
    if isinstance(exc, ConnectionError):
        return FailedToConnectError(msg)
    return RuntimeEngineError(msg)
