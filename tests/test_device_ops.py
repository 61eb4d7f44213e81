"""Device-plane kernel parity tests: each batched JAX op must match its
golden-pinned host (numpy) counterpart, and the full batch pipeline must be
bit-identical to the sequential encoder.  Runs on the virtual CPU backend
(x64 enabled in conftest) so parity is exact.
"""

import io

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from flac_codec_tpu.encode import FlacSampleWriter, Options
from flac_codec_tpu.models import fixed as hfixed
from flac_codec_tpu.models import lpc as hlpc
from flac_codec_tpu.ops import fixed as dfixed
from flac_codec_tpu.ops import lpc as dlpc
from flac_codec_tpu.ops import rice as drice
from flac_codec_tpu.parallel.batch import BatchEncoder
from flac_codec_tpu.rice import best_partitions, residual_section_bits, choose_rice_coding


def _random_signal(rng, n, scale=5000):
    t = np.arange(n)
    return (scale * np.sin(t * rng.uniform(0.001, 0.1))
            + rng.integers(-scale // 20, scale // 20, n)).astype(np.int64)


def test_autocorrelate_matches_host():
    rng = np.random.default_rng(0)
    x = np.stack([_random_signal(rng, 512) for _ in range(4)])
    win = hlpc.window(("tukey", 0.5), 512)
    windowed = x.astype(np.float64) * win
    dev = dlpc.autocorrelate(jnp.asarray(windowed), 8)
    for b in range(4):
        host = hlpc.autocorrelate(windowed[b], 8)
        np.testing.assert_allclose(np.asarray(dev[b]), host, rtol=1e-12)


def test_levinson_matches_host():
    rng = np.random.default_rng(1)
    x = np.stack([_random_signal(rng, 1024) for _ in range(3)])
    win = hlpc.window(("tukey", 0.5), 1024)
    windowed = x.astype(np.float64) * win
    autoc = np.stack([hlpc.autocorrelate(windowed[b], 8) for b in range(3)])
    coeffs, errs = dlpc.levinson(jnp.asarray(autoc), 8)
    for b in range(3):
        host = hlpc.lp_coefficients(autoc[b])
        for o, (hc, he) in enumerate(host):
            np.testing.assert_allclose(np.asarray(coeffs[b, o, :o + 1]), hc,
                                       rtol=1e-9, atol=1e-12)
            np.testing.assert_allclose(float(errs[b, o]), he, rtol=1e-9)


def test_quantize_matches_host():
    rng = np.random.default_rng(2)
    for _ in range(20):
        order = int(rng.integers(1, 9))
        c = rng.normal(0, 1, order)
        if not np.abs(c).max() > 0:
            continue
        padded = np.zeros((1, dlpc.MAX_ORDER))
        padded[0, :order] = c
        shift_d, q_d, valid = dlpc.quantize(
            jnp.asarray(padded), jnp.asarray([order]), 12)
        shift_h, q_h = hlpc.quantize(c, 12)
        assert bool(valid[0])
        assert int(shift_d[0]) == shift_h
        np.testing.assert_array_equal(np.asarray(q_d[0, :order]), q_h)


def test_fixed_cascade_matches_host():
    rng = np.random.default_rng(3)
    x = np.stack([_random_signal(rng, 256) for _ in range(8)])
    diffs, valid = dfixed.diff_cascade(jnp.asarray(x))
    order_d, res_d = dfixed.best_order(diffs, valid)
    for b in range(8):
        order_h, res_h = hfixed.best_fixed_order(x[b])
        assert int(order_d[b]) == order_h
        np.testing.assert_array_equal(
            np.asarray(res_d[b, order_h:]), res_h)


def test_rice_search_matches_host():
    rng = np.random.default_rng(4)
    N = 1024
    for order in [0, 2, 8]:
        res = np.zeros((4, N), dtype=np.int64)
        for b in range(4):
            res[b, order:] = rng.integers(-2000, 2000, N - order)
        plan = drice.search(jnp.asarray(res), jnp.full(4, order),
                            N, 5, 15)
        for b in range(4):
            host = best_partitions(res[b, order:], order, 5, 15)
            host_po = int(np.log2(len(host)))
            assert int(plan["po"][b]) == host_po
            for p, (kind, param, _) in enumerate(host):
                kmap = {"rice": 0, "escape": 1, "constant": 2}
                assert int(plan["kinds"][b, p]) == kmap[kind]
                if kind != "constant":
                    assert int(plan["params"][b, p]) == param
            # exact bits match serialized size
            host_bits = residual_section_bits(host, 4)
            assert int(plan["exact_bits"][b]) == host_bits


def test_batch_pipeline_bit_exact():
    rng = np.random.default_rng(5)
    bs = 1024
    n = bs * 6 + 123
    t = np.arange(n)
    left = (4000 * np.sin(t * 0.01) + rng.integers(-100, 100, n)).astype(np.int32)
    right = (4000 * np.sin(t * 0.013) + rng.integers(-100, 100, n)).astype(np.int32)
    inter = np.stack([left, right]).T.reshape(-1)

    for opts in [Options(block_size=bs), Options.fast(),
                 Options(block_size=bs, max_lpc_order=None),
                 Options(block_size=bs, mid_side=False),
                 Options(block_size=bs,
                         exhaustive_channel_correlation=False)]:
        b1 = io.BytesIO()
        w = FlacSampleWriter(b1, opts, 44100, 16, 2, total_samples=n)
        w.write(inter)
        w.finalize()
        b2 = io.BytesIO()
        be = BatchEncoder(b2, opts, 44100, 16, 2, total_samples=n,
                          batch_frames=3)
        be.write(inter)
        be.finalize()
        assert b1.getvalue() == b2.getvalue(), f"mismatch for {opts}"


def test_batch_pipeline_24bit_rice2():
    rng = np.random.default_rng(6)
    bs = 1024
    n = bs * 4
    inter = (rng.integers(-(1 << 22), 1 << 22, 2 * n)).astype(np.int32)
    opts = Options(block_size=bs)
    b1 = io.BytesIO()
    w = FlacSampleWriter(b1, opts, 96000, 24, 2, total_samples=n)
    w.write(inter)
    w.finalize()
    b2 = io.BytesIO()
    be = BatchEncoder(b2, opts, 96000, 24, 2, total_samples=n, batch_frames=2)
    be.write(inter)
    be.finalize()
    assert b1.getvalue() == b2.getvalue()


def test_batch_pipeline_narrow_gate_boundary():
    """bps 26 is the widest stereo width the planner's int32 narrow
    analysis mode admits (side = 27 bits + 4 bits of fixed-cascade
    widening = 31); bps 27 must take the int64 panels.  Both sides of
    the gate stay byte-identical to the host encoder."""
    rng = np.random.default_rng(8)
    bs = 512
    n = bs * 3
    for bps in (26, 27):
        lim = 1 << (bps - 2)
        inter = (rng.integers(-lim, lim, 2 * n)).astype(np.int64)
        opts = Options(block_size=bs)
        b1 = io.BytesIO()
        w = FlacSampleWriter(b1, opts, 96000, bps, 2, total_samples=n)
        w.write(inter)
        w.finalize()
        b2 = io.BytesIO()
        be = BatchEncoder(b2, opts, 96000, bps, 2, total_samples=n,
                          batch_frames=2)
        be.write(inter)
        be.finalize()
        assert b1.getvalue() == b2.getvalue(), f"bps={bps}"


def test_batch_pipeline_mono_and_multichannel():
    rng = np.random.default_rng(7)
    bs = 512
    n = bs * 4
    for channels in [1, 4]:
        inter = (rng.integers(-5000, 5000, channels * n)).astype(np.int32)
        opts = Options(block_size=bs)
        b1 = io.BytesIO()
        w = FlacSampleWriter(b1, opts, 44100, 16, channels, total_samples=n)
        w.write(inter)
        w.finalize()
        b2 = io.BytesIO()
        be = BatchEncoder(b2, opts, 44100, 16, channels, total_samples=n,
                          batch_frames=2)
        be.write(inter)
        be.finalize()
        assert b1.getvalue() == b2.getvalue()


def test_batch_pipeline_sharded_mesh():
    """Same bytes when the batch is sharded over the 8-device CPU mesh."""
    from flac_codec_tpu.parallel.mesh import batch_mesh

    rng = np.random.default_rng(8)
    bs = 512
    n = bs * 16
    inter = (rng.integers(-3000, 3000, 2 * n)).astype(np.int32)
    opts = Options(block_size=bs)

    b1 = io.BytesIO()
    be1 = BatchEncoder(b1, opts, 44100, 16, 2, total_samples=n,
                       batch_frames=16)
    be1.write(inter)
    be1.finalize()

    mesh = batch_mesh(jax.devices("cpu"))
    b2 = io.BytesIO()
    be2 = BatchEncoder(b2, opts, 44100, 16, 2, total_samples=n,
                       batch_frames=16, mesh=mesh)
    be2.write(inter)
    be2.finalize()
    assert b1.getvalue() == b2.getvalue()


def test_plan_blob_roundtrip_matches_dict_plan():
    """encode_frames_plan_blob + unpack must reproduce the dict plan."""
    from flac_codec_tpu.ops.encode_batch import (
        encode_frames_plan, encode_frames_plan_blob, plan_blob_spec,
        unpack_plan_blob)

    rng = np.random.default_rng(9)
    B, N = 3, 512
    t = np.arange(B * N).reshape(B, 1, N)
    pcm = np.concatenate([
        4000 * np.sin(t * 0.01) + rng.integers(-50, 50, (B, 1, N)),
        3000 * np.sin(t * 0.02) + rng.integers(-50, 50, (B, 1, N))],
        axis=1).astype(np.int32)
    kw = dict(bits_per_sample=16, block_size=N, max_lpc_order=8,
              max_partition_order=4, mid_side=True, exhaustive=True,
              analysis="f64", pack_budget=18)
    plan = jax.tree_util.tree_map(np.asarray, encode_frames_plan(
        jnp.asarray(pcm), **kw))
    blob = np.asarray(encode_frames_plan_blob(jnp.asarray(pcm), **kw))
    spec = plan_blob_spec(pcm.shape, pcm.dtype, **kw)
    plan2 = unpack_plan_blob(blob, spec)
    flat1, td1 = jax.tree_util.tree_flatten(plan)
    flat2, td2 = jax.tree_util.tree_flatten(plan2)
    assert td1 == td2
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batch_pipeline_verbatim_fallback():
    """Full-range noise forces verbatim subframes; the packed pipeline's
    warm-up-only native mode must fall back per frame and stay
    bit-identical to the sequential encoder."""
    rng = np.random.default_rng(17)
    bs = 512
    n = bs * 5
    # incompressible full-scale noise -> verbatim wins in most frames
    inter = rng.integers(-32768, 32767, 2 * n).astype(np.int32)
    opts = Options(block_size=bs)
    b1 = io.BytesIO()
    w = FlacSampleWriter(b1, opts, 44100, 16, 2, total_samples=n)
    w.write(inter)
    w.finalize()
    b2 = io.BytesIO()
    be = BatchEncoder(b2, opts, 44100, 16, 2, total_samples=n,
                      batch_frames=5, analysis="f64")
    from flac_codec_tpu import native
    if native.load() is not None:
        assert be.pack_budget == 18  # bps+2 default with native splicing
    be.write(inter)
    be.finalize()
    assert b1.getvalue() == b2.getvalue()


def test_batch_pipeline_signal_classes():
    """Adversarial signal classes through the packed batch pipeline:
    silence (constant subframes), wasted bits, impulse trains (escape
    partitions), full-scale squares, tiny amplitudes — all must stay
    bit-identical to the sequential encoder."""
    rng = np.random.default_rng(23)
    bs = 512
    n = bs * 4
    t = np.arange(n)
    signals = {
        "silence": np.zeros(n, np.int32),
        "dc": np.full(n, -123, np.int32),
        "wasted4": (rng.integers(-800, 800, n).astype(np.int32) << 4),
        "impulses": np.where(t % 97 == 0, 20000, 0).astype(np.int32),
        "square": np.where((t // 64) % 2 == 0, 32767, -32768).astype(np.int32),
        "tiny": rng.integers(-2, 2, n).astype(np.int32),
    }
    opts = Options(block_size=bs)
    for name, sig in signals.items():
        inter = np.stack([sig, np.roll(sig, 13)]).T.reshape(-1)
        b1 = io.BytesIO()
        w = FlacSampleWriter(b1, opts, 44100, 16, 2, total_samples=n)
        w.write(inter)
        w.finalize()
        b2 = io.BytesIO()
        be = BatchEncoder(b2, opts, 44100, 16, 2, total_samples=n,
                          batch_frames=4, analysis="f64")
        be.write(inter)
        be.finalize()
        assert b1.getvalue() == b2.getvalue(), f"mismatch for {name}"


def test_batch_pipeline_residual_pack_mode():
    """frame_pack=False keeps the residual-only packed path (blob splice in
    the native assembler) bit-identical — the mode the mesh dryrun and
    older plans use."""
    rng = np.random.default_rng(31)
    bs = 512
    n = bs * 4 + 77
    t = np.arange(n)
    sig = (3000 * np.sin(t * 0.02) + rng.integers(-50, 50, n)).astype(np.int32)
    inter = np.stack([sig, np.roll(sig, 7)]).T.reshape(-1)
    opts = Options(block_size=bs)
    b1 = io.BytesIO()
    w = FlacSampleWriter(b1, opts, 44100, 16, 2, total_samples=n)
    w.write(inter)
    w.finalize()
    b2 = io.BytesIO()
    be = BatchEncoder(b2, opts, 44100, 16, 2, total_samples=n,
                      batch_frames=2, analysis="f64", frame_pack=False)
    assert not be.frame_pack
    be.write(inter)
    be.finalize()
    assert b1.getvalue() == b2.getvalue()


def test_frame_pack_crc_inner_product():
    """The device CRC-16 inner product + host x^(8L+15) finish equals the
    byte-serial CRC for random messages in zero-padded slots (the identity
    ops/framepack.py builds frames on)."""
    from flac_codec_tpu.crc import crc16
    from flac_codec_tpu.ops.framepack import (CRC16_POLY, crc16_inner,
                                              crc16_neg_pow_table)

    def gfmul(a, b):
        r = 0
        for i in range(16):
            if (b >> i) & 1:
                r ^= a << i
        for i in range(30, 15, -1):
            if (r >> i) & 1:
                r ^= CRC16_POLY << (i - 16)
        return r

    def xpow8(nbytes):
        r, v = 1, 0x100
        while nbytes:
            if nbytes & 1:
                r = gfmul(r, v)
            v = gfmul(v, v)
            nbytes >>= 1
        return r

    rng = np.random.default_rng(41)
    W = 16  # words per slot
    B = 8
    table = crc16_neg_pow_table(W * 32)
    lengths = rng.integers(1, W * 4 - 3, B)
    slots = np.zeros((B, W), dtype=np.uint32)
    msgs = []
    for b in range(B):
        raw = rng.integers(0, 256, W * 4, dtype=np.uint32).astype(np.uint8)
        raw[lengths[b]:] = 0
        msgs.append(bytes(raw[:lengths[b]]))
        slots[b] = raw.view(">u4").astype(np.uint32)
    inner = np.asarray(crc16_inner(jnp.asarray(slots), table))
    for b in range(B):
        got = gfmul(int(inner[b]), gfmul(xpow8(int(lengths[b])), 0x8000))
        assert got == crc16(msgs[b]), b


def test_batch_pipeline_unknown_total():
    """Streaming without total_samples (placeholder-free seektable path)."""
    rng = np.random.default_rng(29)
    n = 1024 * 5 + 100
    inter = rng.integers(-3000, 3000, 2 * n).astype(np.int32)
    opts = Options(block_size=1024)
    b1 = io.BytesIO()
    w = FlacSampleWriter(b1, opts, 44100, 16, 2)
    w.write(inter)
    w.finalize()
    b2 = io.BytesIO()
    be = BatchEncoder(b2, opts, 44100, 16, 2, batch_frames=2)
    be.write(inter)
    be.finalize()
    assert b1.getvalue() == b2.getvalue()


def test_batch_pipeline_tiny_blocks_vs_lpc_order():
    """block_size <= max_lpc_order: the host raises
    InsufficientLpcSamples internally and emits no LPC candidate; the
    device pipeline must mirror that (and not crash on lag > N)."""
    rng = np.random.default_rng(41)
    for bs, order in ((16, 32), (32, 32), (32, 16)):
        n = bs * 6
        t = np.arange(n)
        sig = (400 * np.sin(t * 0.2) + rng.integers(-40, 40, n))
        inter = np.stack([sig, np.roll(sig, 3)]).T.reshape(-1).astype(np.int32)
        opts = Options(block_size=bs, max_lpc_order=order)
        b1 = io.BytesIO()
        w = FlacSampleWriter(b1, opts, 44100, 16, 2, total_samples=n)
        w.write(inter)
        w.finalize()
        b2 = io.BytesIO()
        be = BatchEncoder(b2, opts, 44100, 16, 2, total_samples=n,
                          batch_frames=3, analysis="f64")
        be.write(inter)
        be.finalize()
        assert b1.getvalue() == b2.getvalue(), f"mismatch bs={bs} order={order}"


def test_residuals_i32_limb_parity():
    """The narrow-mode all-int32 limb residual path must be bit-identical
    to the int64 path — wrapped panel AND exact overflow flag — across
    magnitudes from tiny to full int32 (round 4; the limb assembly
    mirrors ops/predict_pallas.py's 3/4-limb modes)."""
    rng = np.random.default_rng(7)
    B, N = 48, 256
    for mag in (40, 2 ** 15, 2 ** 24, 2 ** 26, 2 ** 30, 2 ** 31 - 1):
        x = rng.integers(-mag, mag, (B, N)).astype(np.int32)
        q = np.zeros((B, 32), np.int32)
        order = rng.integers(1, 13, B).astype(np.int32)
        for b in range(B):
            q[b, :order[b]] = rng.integers(-(1 << 13), 1 << 13, order[b])
        shift = rng.integers(0, 16, B).astype(np.int32)
        r32, o32 = dlpc.residuals(jnp.asarray(x), jnp.asarray(q),
                                  jnp.asarray(order), jnp.asarray(shift),
                                  max_taps=12)
        r64, o64 = dlpc.residuals(jnp.asarray(x, dtype=np.int64),
                                  jnp.asarray(q), jnp.asarray(order),
                                  jnp.asarray(shift), max_taps=12)
        assert (np.asarray(r32) == np.asarray(r64).astype(np.int32)).all()
        assert (np.asarray(o32) == np.asarray(o64)).all()


def test_prefix_sum_i32_exact():
    """The MXU matmul prefix sum must equal cumsum exactly for every
    admissible input: non-negative int32 with row sums < 2^31 (round 5;
    replaces the reduce-window cumsum in pack_residual_sections)."""
    from flac_codec_tpu.ops.common import prefix_sum_i32
    rng = np.random.default_rng(11)
    for B, N, hi in ((4, 128, 1 << 18), (7, 512, 64), (3, 4096, 1 << 18),
                     (2, 4096, 524287)):
        x = rng.integers(0, hi, (B, N)).astype(np.int32)
        got = np.asarray(prefix_sum_i32(jnp.asarray(x)))
        want = np.cumsum(x.astype(np.int64), axis=1)
        assert want[:, -1].max() < 2 ** 31
        assert (got == want.astype(np.int32)).all()
    # adversarial: max-magnitude elements saturating the row-sum bound
    x = np.full((2, 4096), 524287, np.int32)  # 4096 * (2^19-1) < 2^31
    got = np.asarray(prefix_sum_i32(jnp.asarray(x)))
    want = np.cumsum(x.astype(np.int64), axis=1).astype(np.int32)
    assert (got == want).all()


def test_chunkmerge_panels_matches_pallas_merge():
    """The fused einsum packer (round 5) must produce the same merged
    panels and overflow flags as chunk_panels + merge_panels on every
    non-overflowing row, across symbol widths, sparsity, and offsets."""
    from flac_codec_tpu.ops.packpanel import (CHUNK_R, chunk_panels,
                                              chunkmerge_panels,
                                              merge_panels_ref)
    rng = np.random.default_rng(5)
    N, P = 512, 512
    for seed in range(3):
        r = np.random.default_rng(seed)
        rows = 6
        widths = np.clip(r.poisson(9.5, (rows, N)) + 1, 2, 30).astype(
            np.int64)
        ends = np.cumsum(widths, axis=1) + 6
        vals = r.integers(0, 1 << 16, (rows, N)).astype(np.int64) \
            & ((1 << widths) - 1)
        mask = r.random((rows, N)) > 0.05
        panels, offs, ovf = jax.jit(chunk_panels)(
            jnp.asarray(vals), jnp.asarray(widths), jnp.asarray(ends),
            jnp.asarray(mask))
        ref = merge_panels_ref(np.asarray(panels),
                               np.clip(np.asarray(offs), 0,
                                       P - 2 * CHUNK_R), P)
        got, ovf2 = jax.jit(lambda *a: chunkmerge_panels(*a, P))(
            jnp.asarray(vals), jnp.asarray(widths), jnp.asarray(ends),
            jnp.asarray(mask))
        ok = ~np.asarray(ovf)
        assert (np.asarray(ovf) == np.asarray(ovf2)).all()
        assert (np.asarray(got)[ok] == ref[ok]).all()
