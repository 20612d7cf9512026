from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Environment shim (VERDICT r5 #8): transformWithStateInPandas' Python
# state server needs `google.protobuf`, which isn't pip-installed here.
# A pure-Python protobuf runtime ships on this box inside the Google
# Cloud SDK's App Engine platform dir; when the real package is absent
# and that dir exists, put it on BOTH sys.path (driver) and PYTHONPATH
# (inherited by the JVM -> Python workers, so the state server sees it
# too). Must happen BEFORE the first SparkSession. Harmless elsewhere:
# on boxes with protobuf installed or without the SDK this is a no-op,
# and no engine code depends on it — only the transformWithState test
# un-skips.
_GAE_PROTOBUF_DIR = "/usr/lib/google-cloud-sdk/platform/google_appengine"
try:
    import google.protobuf  # noqa: F401
except ImportError:
    if os.path.isdir(os.path.join(_GAE_PROTOBUF_DIR, "google", "protobuf")):
        sys.path.insert(0, _GAE_PROTOBUF_DIR)
        os.environ["PYTHONPATH"] = (
            _GAE_PROTOBUF_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")
        )
        # The SDK runtime is 6.32.0-dev; pyspark 4.1.2's StateMessage
        # gencode is 6.33.0, one MINOR newer, and protobuf's validator
        # rejects older-runtime-than-gencode. Protobuf's own documented
        # escape hatch covers exactly this adjacent-version case; scoped
        # to the test env only (conftest), never set by engine code.
        # ADVICE r6: an older runtime driving newer gencode can mask
        # wire-format drift, so the shim is allowed ONLY for a runtime
        # exactly one minor behind the gencode — anything wider fails
        # loudly here instead of silently running unsupported pairs.
        import google.protobuf as _pb  # now importable via the shim path

        _runtime = tuple(
            int(x) for x in _pb.__version__.split(".")[:2] if x.isdigit()
        )
        _GENCODE = (6, 33)  # pyspark 4.1.2's StateMessage_pb2 gencode
        assert _runtime[0] == _GENCODE[0] and (
            0 <= _GENCODE[1] - _runtime[1] <= 1
        ), (
            f"protobuf shim: SDK runtime {_pb.__version__} is more than "
            f"one minor behind the {'.'.join(map(str, _GENCODE))} gencode "
            "— pip install protobuf instead of relying on the shim"
        )
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )

from hbase_hadoop_flightsearch_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correctness() -> str:
    # Overridable so the oracle-differential suite can run over an
    # alternate-seed corpus (tools/gen_altseed.py) — the fixture
    # robustness sweep; default stays the driver fixture.
    return os.environ.get("SPARK_GRAFT_SF_CORRECTNESS", SF_CORRECTNESS)
