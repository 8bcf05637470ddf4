from __future__ import annotations



import pytest

from udacity_data_engineer_capstone_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"

# Round-11 directive 7b: a single mid-suite JVM death used to poison
# every later test in the 20-minute monolithic session (round 10: 177
# ConnectionRefusedError cascades from one crash, all green on rerun).
# The spark fixture is a session-scoped SELF-HEALING PROXY: every
# attribute access resolves against a health-checked live session and
# transparently rebuilds the gateway when it is dead — one crash costs
# one test, not the rest of the run. Session scope keeps the fixture
# usable from module-scoped fixtures (crafted-dir builders etc.); the
# liveness probe is one local py4j roundtrip (~0.1 ms) per attribute
# access — noise against any real Spark action.


def _alive(s) -> bool:
    try:
        return not s.sparkContext._jsc.sc().isStopped()
    except Exception:
        return False


def _fresh_session():
    # clear the dead singletons so the builder launches a new JVM
    from pyspark import SparkContext
    from pyspark.sql import SparkSession

    try:
        SparkSession._instantiatedSession = None
        SparkSession._activeSession = None
        SparkContext._active_spark_context = None
        SparkContext._gateway = None
        SparkContext._jvm = None
    except Exception:
        pass
    s = get_spark("engine-tests")
    s.sparkContext.setLogLevel("WARN")
    return s


class _SparkProxy:
    """Delegates every attribute to the current live SparkSession,
    rebuilding it if the JVM died since the last (rate-limited)
    liveness probe."""

    def __init__(self) -> None:
        self._s = None

    def _live(self):
        s = self._s
        if s is None or not _alive(s):
            if s is not None:
                try:
                    s.stop()
                except Exception:
                    pass
            s = _fresh_session()
            self._s = s
        return s

    def __getattr__(self, name):
        return getattr(self._live(), name)


@pytest.fixture(scope="session")
def spark():
    return _SparkProxy()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
