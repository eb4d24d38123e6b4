"""Model compressibility classes (reference docs/UTH.md:119-127).

The reference observes three classes of checkpoints:

1. exponent-only savers (FP32/FP16): modest savings — only the exponent
   byte compresses;
2. "clean"/base models: mantissa LSBs are zero, so the two low mantissa
   byte planes RLE away — very high savings;
3. BF16 models: ~30% savings (the exponent is a bigger fraction).

The published ratios are measured on trained weights; this rig is offline,
so each class is *synthesized* with the structural property that defines
it, and the ratio is asserted to land in the class's band across engines.
bench.py carries a ``compressibility_classes`` section with the measured
ratios per class.
"""
import numpy as np
import pytest

from zipnn_tpu import ZipNN


def class1_fp32(n_el, seed=0):
    """Exponent-only saver: trained-looking fp32 with fully random mantissa."""
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n_el) * 0.04).astype(np.float32)


def class2_fp32_clean(n_el, seed=1):
    """Clean/base model: the 16 low mantissa bits are zero (UTH class 2)."""
    w = class1_fp32(n_el, seed)
    u = w.view(np.uint32)
    u &= np.uint32(0xFFFF0000)
    return u.view(np.float32)


def class3_bf16(n_el, seed=2):
    """BF16 model: exponent compressible, mantissa byte not."""
    w = class1_fp32(n_el, seed)
    return (w.view(np.uint32) >> 16).astype(np.uint16)  # bf16 bit pattern


def _ratio(arr, dtype, engine="numpy", **kw):
    data = arr.tobytes()
    z = ZipNN(bytearray_dtype=dtype, engine=engine, **kw)
    comp = z.compress(data)
    assert bytes(z.decompress(bytes(comp))) == data  # bit-exact
    return len(comp) / len(data)


N = 512 * 1024  # elements


@pytest.mark.parametrize("engine", ["numpy", "native"])
def test_class_bands(engine):
    r1 = _ratio(class1_fp32(N), "float32", engine)
    r2 = _ratio(class2_fp32_clean(N), "float32", engine)
    r3 = _ratio(class3_bf16(N), "bfloat16", engine)
    # class 1: exponent-only — modest savings (reference README: fp32 ~17%)
    assert 0.70 < r1 < 0.90, r1
    # class 2: clean model — very high savings: 2 of 4 planes RLE away
    assert r2 < 0.45, r2
    assert r2 < r1 - 0.3
    # class 3: bf16 ~30% savings band
    assert 0.60 < r3 < 0.80, r3


def test_clean_class_engines_agree():
    w = class2_fp32_clean(N, seed=7)
    data = w.tobytes()
    blobs = {
        e: bytes(ZipNN(bytearray_dtype="float32", engine=e).compress(data))
        for e in ("numpy", "native", "tpu")
    }
    assert blobs["numpy"] == blobs["native"] == blobs["tpu"]


def test_clean_class_shared_profile_band():
    """The TPU-optimal shared profile keeps the very-high-savings band on
    clean models (the zero planes RLE per cell; the table covers the rest)."""
    r2 = _ratio(class2_fp32_clean(N, seed=9), "float32", "numpy",
                huffman_table="shared")
    assert r2 < 0.45, r2


def test_clean_class_stays_base_rate_class():
    """Rate-class planning: a clean model's streams are short (low
    bits/symbol), so the per-cell fast path provisions the BASE class —
    no rate12 cost on the highest-savings checkpoints."""
    from zipnn_tpu import codec
    from zipnn_tpu.ops import jax_decode

    w = class2_fp32_clean(N, seed=11)
    data = np.frombuffer(w.tobytes(), np.uint8)
    chunk = 32 * 1024
    payload = codec.compress_payload_numpy(data, 4, 1, 220, chunk)
    g = jax_decode._parse_geometry(payload, 4, chunk, data.size, 1, 220)
    assert g is not None
    plan = jax_decode._PCPlan.build(g)
    assert plan is not None
    assert not plan.rate12
