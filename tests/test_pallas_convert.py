"""Pallas NV12 decode kernel (ops.pallas_convert) vs the XLA twin.

The XLA formulation is itself pinned bit-exact against the golden model
and the native csrc decoder elsewhere (test_runtime_native, test_fuzz);
here the Pallas band kernel (interpret mode on CPU) must match it
exactly, including geometries that overhang the 64-row band.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from obs_color_monitor_tpu.ops import convert
from obs_color_monitor_tpu.ops.pallas_convert import nv12_decode_pallas


def _planes(rng, h, w):
    y = rng.integers(0, 256, (h, w), np.uint8)
    uv = rng.integers(0, 256, (h // 2, w), np.uint8)
    # plant fixed-point boundary samples: limited-range ends + neutral
    y[0, :3] = (0, 16, 255)
    uv[0, :4] = (0, 255, 128, 128)
    return jnp.asarray(y), jnp.asarray(uv)


@pytest.mark.parametrize("cs", [1, 2])
@pytest.mark.parametrize(
    "h,w",
    [
        (64, 128),  # exact one band
        (48, 64),   # single short band
        (130, 256), # band overhang + odd half-band uv rows
        (2, 8),     # degenerate minimum
    ],
)
def test_pallas_decode_matches_xla(rng, h, w, cs):
    y, uv = _planes(rng, h, w)
    ref = np.asarray(convert._nv12_to_packed_xla(y, uv, cs=cs))
    got = np.asarray(nv12_decode_pallas(y, uv, cs=cs, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_pallas_decode_rejects_bad_geometry(rng):
    y, uv = _planes(rng, 16, 16)
    with pytest.raises(ValueError, match="geometry"):
        nv12_decode_pallas(y[:, :14], uv[:, :14], interpret=True)  # W % 4
    with pytest.raises(ValueError, match="geometry"):
        nv12_decode_pallas(y, uv[:4], interpret=True)  # uv mismatch


def test_dispatcher_prefers_pallas_on_tpu(rng, monkeypatch):
    """nv12_to_packed routes to the kernel exactly when the backend is
    pallas-capable AND the geometry supports the u32 views."""
    y, uv = _planes(rng, 16, 16)
    ref = np.asarray(convert._nv12_to_packed_xla(y, uv, cs=2))

    calls = []

    def fake_pallas(y, uv, cs=2):
        calls.append(True)
        return nv12_decode_pallas(y, uv, cs=cs, interpret=True)

    import obs_color_monitor_tpu.ops.fused as fused
    import obs_color_monitor_tpu.ops.pallas_convert as pc

    monkeypatch.setattr(fused, "default_backend", lambda: "pallas")
    monkeypatch.setattr(pc, "nv12_decode_pallas", fake_pallas)
    got = np.asarray(convert.nv12_to_packed(y, uv, cs=2))
    np.testing.assert_array_equal(got, ref)
    assert calls == [True]

    # W % 4 != 0 falls back to XLA even on the pallas backend
    calls.clear()
    y2, uv2 = _planes(rng, 16, 10)
    got2 = np.asarray(convert.nv12_to_packed(y2, uv2, cs=2))
    np.testing.assert_array_equal(
        got2, np.asarray(convert._nv12_to_packed_xla(y2, uv2, cs=2))
    )
    assert calls == []


def _planes16(rng, h, w, bits, msb):
    hi = 1 << bits
    y = rng.integers(0, hi, (h, w)).astype(np.uint16)
    uv = rng.integers(0, hi, (h // 2, w)).astype(np.uint16)
    y.flat[:3] = (513, 514, hi - 1) if bits == 10 else (0, 1, hi - 1)
    if msb:
        y, uv = (y << (16 - bits)).astype(np.uint16), (
            uv << (16 - bits)
        ).astype(np.uint16)
    return jnp.asarray(y), jnp.asarray(uv)


@pytest.mark.parametrize("bits,msb", [(10, False), (10, True), (12, False),
                                      (16, False)])
@pytest.mark.parametrize("h,w", [(64, 128), (130, 254), (2, 4)])
def test_pallas_decode16_matches_host_policy(rng, h, w, bits, msb):
    """The fused shift+decode (both the Pallas kernel and its XLA twin)
    equals the host round-shift (ingest `_to8`) followed by the 8-bit
    decode, for every supported depth and both alignments."""
    from obs_color_monitor_tpu.ops.convert import nv12_shift
    from obs_color_monitor_tpu.ops.pallas_convert import nv12_16_decode_pallas

    shift = nv12_shift(bits, msb)
    y16, uv16 = _planes16(rng, h, w, bits, msb)

    def to8(a):  # the ingest host policy (pipeline/ingest.py _to8)
        v = (np.asarray(a).astype(np.uint32) + (1 << (shift - 1))) >> shift
        return jnp.asarray(np.minimum(v, 255).astype(np.uint8))

    ref = np.asarray(convert._nv12_to_packed_xla(to8(y16), to8(uv16), cs=2))
    xla = np.asarray(convert._nv12_16_to_packed_xla(y16, uv16, cs=2,
                                                    shift=shift))
    np.testing.assert_array_equal(xla, ref)
    got = np.asarray(
        nv12_16_decode_pallas(y16, uv16, cs=2, shift=shift, interpret=True)
    )
    np.testing.assert_array_equal(got, ref)


def test_wrong_dtype_rejected(rng):
    """A forgotten shift= on u16 wire planes (and the converse) must fail
    loudly — raw 16-bit samples through the 8-bit decode would publish
    silently wrong statistics."""
    y8, uv8 = _planes(rng, 16, 16)
    y16, uv16 = _planes16(rng, 16, 16, 10, False)
    with pytest.raises(TypeError, match="u8"):
        convert.nv12_to_packed(y16, uv16)  # u16 without shift=
    with pytest.raises(TypeError, match="u16"):
        convert.nv12_to_packed(y8, uv8, shift=2)  # u8 with shift


def test_nv12_shift_helper():
    from obs_color_monitor_tpu.ops.convert import nv12_shift

    assert nv12_shift(8) == 0
    assert nv12_shift(10) == 2
    assert nv12_shift(10, msb_aligned=True) == 8
    assert nv12_shift(16) == 8
    with pytest.raises(ValueError, match="bits"):
        nv12_shift(9)


@pytest.mark.skipif(
    bool(__import__("os").environ.get("OCM_TEST_TPU")),
    reason="asserts the CPU backend's dispatch choice; on hardware the "
    "Pallas path is (correctly) selected",
)
def test_dispatcher_stays_xla_on_cpu(rng):
    """On the CPU test backend the dispatcher must keep the XLA path (the
    golden-pinned portable route); result identical either way."""
    y, uv = _planes(rng, 32, 32)
    assert not convert._nv12_pallas_ok(y, uv)
    got = np.asarray(convert.nv12_to_packed(y, uv, cs=1))
    ref = np.asarray(convert._nv12_to_packed_xla(y, uv, cs=1))
    np.testing.assert_array_equal(got, ref)
