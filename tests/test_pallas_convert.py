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


def test_dispatcher_stays_xla_on_cpu(rng):
    """On the CPU test backend the dispatcher must keep the XLA path (the
    golden-pinned portable route); result identical either way."""
    y, uv = _planes(rng, 32, 32)
    assert not convert._nv12_pallas_ok(y, uv)
    got = np.asarray(convert.nv12_to_packed(y, uv, cs=1))
    ref = np.asarray(convert._nv12_to_packed_xla(y, uv, cs=1))
    np.testing.assert_array_equal(got, ref)
