import numpy as np
import pytest

from openvvc_tpu.rcn.ref_transform import dequant, inverse_transform_2d


@pytest.fixture(scope="module")
def jaxmod():
    jt = pytest.importorskip("openvvc_tpu.rcn.jax_transform")
    return jt


@pytest.mark.parametrize("log2_w,log2_h", [(2, 2), (3, 3), (4, 4), (5, 5), (6, 6), (3, 5), (5, 2)])
@pytest.mark.parametrize("dep_quant", [False, True])
def test_dequant_batch_matches_ref(jaxmod, log2_w, log2_h, dep_quant):
    rng = np.random.RandomState(log2_w * 8 + log2_h)
    n = 5
    h, w = 1 << log2_h, 1 << log2_w
    levels = rng.randint(-300, 300, (n, h, w)).astype(np.int32)
    qps = rng.randint(0, 63, n).astype(np.int32)
    got = np.asarray(jaxmod.dequant_batch(levels, qps, log2_w, log2_h, dep_quant, 8))
    for i in range(n):
        exp = dequant(levels[i], int(qps[i]), log2_w, log2_h, dep_quant, 8)
        np.testing.assert_array_equal(got[i], exp, err_msg=f"qp={qps[i]}")


@pytest.mark.parametrize(
    "tr_h,tr_v,log2_w,log2_h",
    [
        ("DCT2", "DCT2", 3, 3),
        ("DCT2", "DCT2", 6, 6),
        ("DST7", "DST7", 3, 3),
        ("DCT8", "DST7", 4, 4),
        ("DST7", "DCT2", 2, 5),
        ("DCT2", "DCT8", 5, 3),
    ],
)
def test_inverse_transform_batch_matches_ref(jaxmod, tr_h, tr_v, log2_w, log2_h):
    rng = np.random.RandomState(7)
    n = 4
    h, w = 1 << log2_h, 1 << log2_w
    coeffs = rng.randint(-2000, 2000, (n, h, w)).astype(np.int32)
    # respect zero-out for 64-size
    if h == 64:
        coeffs[:, 32:, :] = 0
    if w == 64:
        coeffs[:, :, 32:] = 0
    got = np.asarray(jaxmod.inverse_transform_batch(coeffs, tr_h, tr_v, log2_w, log2_h, 8))
    for i in range(n):
        exp = inverse_transform_2d(coeffs[i], log2_w, log2_h, tr_h, tr_v, 8)
        np.testing.assert_array_equal(got[i], exp)
