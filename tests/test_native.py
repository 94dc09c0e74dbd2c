"""Native C++ Criteo parser: build, parse, and Python-oracle equivalence."""

import numpy as np
import pytest

from torecsys_tpu.data.native import (
    NUM_CATS,
    NUM_DENSE,
    native_available,
    parse_criteo_tsv,
)

HASH_SIZES = [1000 + 37 * f for f in range(NUM_CATS)]


GARBAGE_DENSE = ["12a", "+5", "-3", " 7", "+", "-", "0x1f", "3.5", "1e3", ""]


def _synthetic_lines(n, seed=0, mangle=False):
    rng = np.random.default_rng(seed)
    lines = []
    for i in range(n):
        label = str(int(rng.uniform() < 0.3))
        dense = [
            "" if rng.uniform() < 0.2 else str(int(rng.integers(-2, 1000)))
            for _ in range(NUM_DENSE)
        ]
        cats = [
            "" if rng.uniform() < 0.2 else f"{int(rng.integers(0, 2**32)):08x}"
            for _ in range(NUM_CATS)
        ]
        if mangle and i % 11 == 5:
            # garbage / signed / whitespace / sign-only dense tokens: both
            # parsers must treat non-`[+-]?[0-9]+` tokens as missing
            for f in range(NUM_DENSE):
                dense[f] = GARBAGE_DENSE[(i + f) % len(GARBAGE_DENSE)]
        line = "\t".join([label] + dense + cats)
        if mangle and i % 7 == 3:
            line = line[: len(line) // 2]  # malformed row -> zeros
        if mangle and i % 13 == 8:
            line = line + "\textra\tfields"  # >40 fields -> zero row
        lines.append(line)
    return ("\n".join(lines) + "\n").encode()


def test_python_parser_shapes_and_values():
    data = _synthetic_lines(50)
    out = parse_criteo_tsv(data, HASH_SIZES, force_python=True)
    assert out["label"].shape == (50,)
    assert out["dense"].shape == (50, NUM_DENSE)
    assert out["cats"].shape == (50, NUM_CATS)
    assert out["label"].dtype == np.float32
    assert out["cats"].dtype == np.int32
    assert (out["cats"] >= 0).all()
    assert (out["cats"] < np.asarray(HASH_SIZES)[None, :]).all()
    assert (out["dense"] >= 0).all()  # log1p of clamped-positive ints


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
@pytest.mark.parametrize("mangle", [False, True])
@pytest.mark.parametrize("trailing_newline", [False, True])
def test_native_matches_python_oracle(mangle, trailing_newline):
    data = _synthetic_lines(200, seed=3, mangle=mangle)
    if not trailing_newline:
        data = data[:-1]
    want = parse_criteo_tsv(data, HASH_SIZES, force_python=True)
    got = parse_criteo_tsv(data, HASH_SIZES, num_threads=4)
    for k in ("label", "cats"):
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    # libm log1pf vs numpy log1p differ by <= 1 ULP
    np.testing.assert_allclose(got["dense"], want["dense"], rtol=2e-7, atol=0)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_max_rows_and_empty():
    data = _synthetic_lines(20, seed=5)
    out = parse_criteo_tsv(data, HASH_SIZES, max_rows=7)
    assert out["label"].shape == (7,)
    empty = parse_criteo_tsv(b"", HASH_SIZES)
    assert empty["label"].shape == (0,)
