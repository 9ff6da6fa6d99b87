"""C API: build the native library + smoke client and run it.

Covers the reference's C API capability bar (reference:
src/include/duckdb.h surface, src/main/capi/) — open/connect/query/
typed value reads/prepared statements/appender from a real C program.
"""

import os
import shutil
import subprocess

import pytest

NATIVE = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.mark.skipif(shutil.which("cc") is None
                    or shutil.which("python3-config") is None,
                    reason="C toolchain unavailable")
def test_capi_smoke():
    r = subprocess.run(["make", "libddb_tpu.so", "capi_smoke"],
                       cwd=NATIVE, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.abspath(os.path.join(NATIVE, ".."))
    env.pop("JAX_PLATFORMS", None)   # capi defaults to cpu itself
    r = subprocess.run([os.path.join(NATIVE, "capi_smoke")], cwd=NATIVE,
                       capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
    assert "capi smoke: OK" in r.stdout


@pytest.mark.skipif(shutil.which("cc") is None
                    or shutil.which("python3-config") is None,
                    reason="C toolchain unavailable")
def test_adbc_smoke():
    # ADBC driver shim: ArrowArrayStream over the columnar export
    # (reference: src/common/adbc/ driver + adbc.h spec)
    r = subprocess.run(["make", "libddb_tpu.so", "libddb_tpu_adbc.so",
                        "adbc_smoke"],
                       cwd=NATIVE, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.abspath(os.path.join(NATIVE, ".."))
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run([os.path.join(NATIVE, "adbc_smoke")], cwd=NATIVE,
                       capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
    assert "adbc smoke: OK" in r.stdout
