"""Winograd F(2x2,3x3) fused conv (ops/winograd) vs the direct formula.

The kernel rebuilds gn_silu_conv3x3's contract with 2.25x fewer MXU
multiplies; dispatch is a measured per-shape allowlist (ds2/ds4 UNet
ResBlock shapes where it beat XLA on v5e — .audit_r04.jsonl
winograd_ab). Interpret-mode parity here; TPU adoption was A/B'd
in-loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tooncrafter_tpu.ops.spatial_conv as sc
from tooncrafter_tpu.ops import winograd as wg
from tooncrafter_tpu.ops.norms import gn_affine


def _mats(key, n, h, w, cin, cout):
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (n, h, w, cin), jnp.float32)
    scale = jax.random.normal(ks[1], (cin,)) * 0.2 + 1.0
    bias = jax.random.normal(ks[2], (cin,)) * 0.1
    kernel = jax.random.normal(ks[3], (3, 3, cin, cout)) * 0.05
    cbias = jax.random.normal(ks[4], (cout,)) * 0.1
    res = jax.random.normal(ks[5], (n, h, w, cout))
    return x, scale, bias, kernel, cbias, res


def _run(key, n, h, w, cin, cout, *, use_res, silu, stats, entry,
         monkeypatch, tol):
    x, scale, bias, kernel, cbias, res = _mats(key, n, h, w, cin, cout)
    a, b = gn_affine(x, scale, bias, num_groups=32, eps=1e-5)
    r = res if use_res else None
    ref = sc._xla_impl(x, a, b, kernel, cbias, r, silu, stats)
    monkeypatch.setitem(wg._TABLE, (h, w, cin, cout), entry)
    monkeypatch.setattr(wg, "_INTERPRET", True)
    got = wg.winograd_gn_silu_conv3x3(x, a, b, kernel, cbias, r, silu,
                                      stats)
    if stats:
        got, s1, s2 = got
        ref, r1, r2 = ref
        np.testing.assert_allclose(np.asarray(s1), np.asarray(r1),
                                   atol=tol * h * w, rtol=tol)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(r2),
                                   atol=tol * h * w * 10, rtol=tol)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=tol, rtol=tol)


@pytest.mark.parametrize("use_res", [False, True])
@pytest.mark.parametrize("f32t", [False, True])
def test_small_shape_parity(use_res, f32t, monkeypatch):
    _run(jax.random.PRNGKey(0), 4, 8, 8, 128, 128, use_res=use_res,
         silu=True, stats=False, entry=(2, 0, f32t, 0),
         monkeypatch=monkeypatch, tol=1e-4)


def test_stats_and_no_silu(monkeypatch):
    _run(jax.random.PRNGKey(1), 2, 8, 8, 128, 128, use_res=False,
         silu=False, stats=True, entry=(2, 0, True, 0),
         monkeypatch=monkeypatch, tol=1e-4)


def test_cout_tiled_real_shape(monkeypatch):
    # the ds4 allowlist entry's geometry (Cout tiled at 640), scaled to
    # n=8 so the nb=8 grid packing is exercised
    _run(jax.random.PRNGKey(2), 8, 10, 16, 1280, 1280, use_res=True,
         silu=True, stats=True, entry=(8, 640, True, 0),
         monkeypatch=monkeypatch, tol=2e-4)


def test_nb_reduces_to_divide_n(monkeypatch):
    # n=2 with a table nb=8: the kernel must clamp nb to a divisor
    _run(jax.random.PRNGKey(3), 2, 8, 8, 128, 128, use_res=False,
         silu=True, stats=False, entry=(8, 0, False, 0),
         monkeypatch=monkeypatch, tol=1e-4)


def test_ktiled_wide_cin(monkeypatch):
    # the ds2 skip-concat geometry: cin tiled at 640 (3 tiles),
    # accumulating the quadrant partials in fp32 scratch
    _run(jax.random.PRNGKey(6), 2, 8, 8, 384, 128, use_res=True,
         silu=True, stats=True, entry=(2, 0, False, 128),
         monkeypatch=monkeypatch, tol=2e-4)


def test_dispatch_allowlist(monkeypatch):
    monkeypatch.setattr(wg, "_WINOGRAD", True)
    assert wg.table_entry(20, 32, 640, 640)
    assert wg.table_entry(10, 16, 1280, 1280)
    # measured losses / Mosaic-illegal shapes stay XLA
    assert wg.table_entry(40, 64, 320, 320) is None
    assert wg.table_entry(40, 64, 640, 320) is None
    assert wg.table_entry(20, 32, 1920, 640)  # K-tiled skip-concat
    assert wg.table_entry(10, 16, 2560, 1280)
    assert wg.table_entry(20, 32, 960, 640) is None  # 960 % 128 != 0
    monkeypatch.setattr(wg, "_WINOGRAD", False)
    assert wg.table_entry(20, 32, 640, 640) is None


def test_transform_kernel_identity():
    # W' contracted back through A^T reproduces the direct conv on a
    # single 4x4 tile: spot-check the G-matrix plumbing
    k = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 8, 8)) * 0.1
    wt = wg.transform_kernel(k)
    assert wt.shape == (16, 8, 8)
    # central tap passes through: G row [0.5,.5,.5] sums -> brute check
    d = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 4, 8))
    # direct valid conv on the 4x4 -> 2x2
    ref = jax.lax.conv_general_dilated(
        d, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    B = np.array([[1, 0, 0, 0], [0, 1, -1, 1],
                  [-1, 1, 1, 0], [0, 0, 0, -1]], np.float32)
    A = np.array([[1, 0], [1, 1], [1, -1], [0, -1]], np.float32)
    u = jnp.einsum("ai,bj,nabc->nijc", B, B, d)  # B^T d B
    # elementwise multiply-accumulate against the 16 transformed taps
    mw = jnp.einsum("nijc,ijck->nijk", u,
                    wt.reshape(4, 4, 8, 8))
    y = jnp.einsum("ia,jb,nijk->nabk", A, A, mw)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# F(2x4, 3x3) variant (winograd24_gn_silu_conv3x3): 3x multiply
# reduction, fp32 input transforms (the F(4,3) combos carry 4/5/2
# coefficients). Same contract, same test harness.
# ---------------------------------------------------------------------------


def _run24(key, n, h, w, cin, cout, *, use_res, silu, stats, entry,
           monkeypatch, tol):
    x, scale, bias, kernel, cbias, res = _mats(key, n, h, w, cin, cout)
    a, b = gn_affine(x, scale, bias, num_groups=32, eps=1e-5)
    r = res if use_res else None
    ref = sc._xla_impl(x, a, b, kernel, cbias, r, silu, stats)
    monkeypatch.setitem(wg._TABLE24, (h, w, cin, cout), entry)
    monkeypatch.setattr(wg, "_INTERPRET", True)
    got = wg.winograd24_gn_silu_conv3x3(x, a, b, kernel, cbias, r, silu,
                                        stats)
    if stats:
        got, s1, s2 = got
        ref, r1, r2 = ref
        np.testing.assert_allclose(np.asarray(s1), np.asarray(r1),
                                   atol=tol * h * w, rtol=tol)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(r2),
                                   atol=tol * h * w * 10, rtol=tol)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=tol, rtol=tol)


@pytest.mark.parametrize("use_res", [False, True])
@pytest.mark.parametrize("f32t", [False, True])
def test_f24_small_shape_parity(use_res, f32t, monkeypatch):
    _run24(jax.random.PRNGKey(10), 4, 8, 8, 128, 128, use_res=use_res,
           silu=True, stats=False, entry=(2, 0, f32t, 0),
           monkeypatch=monkeypatch, tol=2e-4)


def test_f24_stats_no_silu_ktiled(monkeypatch):
    _run24(jax.random.PRNGKey(11), 2, 8, 8, 256, 128, use_res=True,
           silu=False, stats=True, entry=(2, 0, False, 128),
           monkeypatch=monkeypatch, tol=2e-4)


def test_f24_ct_tiled(monkeypatch):
    _run24(jax.random.PRNGKey(12), 2, 10, 16, 256, 256, use_res=True,
           silu=True, stats=True, entry=(2, 128, True, 0),
           monkeypatch=monkeypatch, tol=2e-4)


def test_f24_dispatch_geometry_gates(monkeypatch):
    monkeypatch.setitem(wg._TABLE24, (10, 18, 128, 128), (1, 0, False, 0))
    monkeypatch.setattr(wg, "_WINOGRAD24", True)
    # w % 4 != 0 -> not taken even if a table entry exists
    assert wg.table_entry24(10, 18, 128, 128) is None
    monkeypatch.setitem(wg._TABLE24, (10, 16, 128, 128), (1, 0, False, 0))
    assert wg.table_entry24(10, 16, 128, 128)
    monkeypatch.setattr(wg, "_WINOGRAD24", False)
    assert wg.table_entry24(10, 16, 128, 128) is None


@pytest.mark.parametrize("kind", ["f22", "f24"])
def test_bf16_ref_prologue_cast_point(kind, monkeypatch):
    """The kernels honor spatial_conv._PROLOGUE_DTYPE (advisor r4): with
    'ref' the fp32 affine result is cast to bf16 BEFORE SiLU (torch
    autocast cast points); with 'f32' SiLU stays fp32. Asserts (a) the
    kernel output tracks the XLA impl under the same mode at bf16-conv
    tolerance and (b) the two modes actually produce different kernel
    outputs (the setting is consulted, not ignored)."""
    n, h, w, cin, cout = 4, 8, 8, 128, 128
    x, scale, bias, kernel, cbias, _ = _mats(
        jax.random.PRNGKey(3), n, h, w, cin, cout)
    x = x.astype(jnp.bfloat16)
    kernel = kernel.astype(jnp.bfloat16)
    a, b = gn_affine(x, scale, bias, num_groups=32, eps=1e-5)
    table = wg._TABLE if kind == "f22" else wg._TABLE24
    impl = wg.winograd_gn_silu_conv3x3 if kind == "f22" \
        else wg.winograd24_gn_silu_conv3x3
    monkeypatch.setitem(table, (h, w, cin, cout), (2, 0, True, 0))
    monkeypatch.setattr(wg, "_INTERPRET", True)
    outs = {}
    for mode in ("ref", "f32"):
        monkeypatch.setattr(sc, "_PROLOGUE_DTYPE", mode)
        want = sc._xla_impl(x, a, b, kernel, cbias, None, True, False)
        got = impl(x, a, b, kernel, cbias, None, True, False)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=0.06, rtol=0.06)
        outs[mode] = np.asarray(got, np.float32)
    assert np.any(outs["ref"] != outs["f32"])
