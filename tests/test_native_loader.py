"""Native C++ table parser vs the pure-Python fallback: bit-identical."""

import os
import subprocess

import numpy as np
import pytest

import qcpinn_tpu.data.cz_loader as czl

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


@pytest.fixture(scope="module")
def native_lib():
    so = os.path.join(NATIVE_DIR, "libqcpinn_native.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", NATIVE_DIR], check=True, capture_output=True)
        except Exception:
            pytest.skip("no C++ toolchain available")
    czl._NATIVE_CHECKED = False
    czl._NATIVE = None
    lib = czl._native_lib()
    if lib is None:
        pytest.skip("native lib failed to load")
    return lib


def _write_table(tmp_path, text):
    p = tmp_path / "t.txt"
    p.write_text(text)
    return str(p)


def test_native_matches_python(tmp_path, native_lib):
    path = _write_table(
        tmp_path,
        "% COMSOL header\n"
        "% more header\n"
        "1.0 2.0 3.5e-2\n"
        "4.0, 5.0, -6.25\n"
        "bad line with words\n"
        "7 8 9\n",
    )
    got = czl.read_table(path)
    czl._NATIVE = None  # force python fallback
    want = czl.read_table(path)
    czl._NATIVE_CHECKED = False
    np.testing.assert_array_equal(got, want)
    assert got.shape == (3, 3)
    np.testing.assert_allclose(got[1], [4.0, 5.0, -6.25])


def test_native_on_real_comsol_file(native_lib):
    path = os.path.join(
        os.path.dirname(__file__), "..", "data", "cz_melt_synthetic.txt"
    )
    if not os.path.exists(path):
        pytest.skip("COMSOL file absent")
    data = czl.read_table(path)
    assert data.shape[0] == 1760
    czl._NATIVE = None
    py = czl.read_table(path)
    czl._NATIVE_CHECKED = False
    np.testing.assert_array_equal(data, py)


def test_ragged_rows_skipped(tmp_path, native_lib):
    path = _write_table(tmp_path, "1 2 3\n4 5\n6 7 8\n")
    got = czl.read_table(path)
    assert got.shape == (2, 3)
