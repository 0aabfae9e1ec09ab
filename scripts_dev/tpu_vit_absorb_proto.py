"""Absorbed-ViT prototype: hide a full CLIP ViT-L forward inside a
decode-shaped weight-stream sequence via fused_mlp side tiles.

The decode loop is weight-DMA-bound (BASELINE.md decode anatomy); its
MXU idles ~92%+ of every launch. This driver runs the real structure a
pipelined generate would use — lax.scan over 24 iterations where each
iteration is one decode step's worth of stacked-weight fused_mlp
launches (layer_idx 0..23, exactly scan_fused_decode's stream) — and
rides ViT layer v's matmuls as side tiles on iterations' launches:

  slot 0-2   q/k/v projection tiles (pre-LN1 fused in-kernel, biases)
  glue       attention (XLA: fp32 softmax over S=257, head merge)
  slot 3     out-proj tile (+ residual from the workspace)
  slot 4-7   fc1 N-slices (pre-LN2 fused, biases)
  slot 8-11  fc2 K-slices (quick_gelu fused, residual chaining)
  slot 12-23 plain stream launches (no side work)

Parity: the absorbed workspace must equal a plain-XLA ViT layer scan on
the same weights. Perf: t(absorbed) vs t(stream alone) + t(XLA ViT) —
the net is the device time a pipelined generate would save per batch.

Usage:
  python scripts_dev/tpu_vit_absorb_proto.py          # TPU, ViT-L geometry
  python scripts_dev/tpu_vit_absorb_proto.py --cpu    # tiny interpret parity
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPU = "--cpu" in sys.argv

import jax

if CPU:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from open_flamingo_tpu.ops import dense_stream
from open_flamingo_tpu.ops.dense_stream import fused_mlp

if CPU:
    dense_stream.INTERPRET = True
    from open_flamingo_tpu.ops import vit_attention as _va

    _va.INTERPRET = True
    B_IMG, S, D_VIT, H, INTER = 2, 17, 128, 4, 512
    B_DEC, D_DEC, K2_DEC, L_DEC = 4, 128, 512, 12
    BLOCK_K2 = 128
    N_LAYERS = 3
    DTYPE = jnp.float32
else:
    B_IMG, S, D_VIT, H, INTER = 32, 257, 1024, 16, 4096
    B_DEC, D_DEC, K2_DEC, L_DEC = 32, 2048, 8192, 24
    BLOCK_K2 = dense_stream.BLOCK_K2
    N_LAYERS = 24
    DTYPE = jnp.bfloat16

DH = D_VIT // H
M_REAL = B_IMG * S
GRID = -(-K2_DEC // BLOCK_K2)
# pad the token rows so every M block is a multiple of 16 sublanes
M_PAD = -(-M_REAL // (16 * GRID)) * 16 * GRID
# FLAT layout (round-5 lever (a)): pad each image's sequence to a
# sublane multiple so the workspace is exactly (B * S_PADF, D) — the
# attention boundary becomes a free reshape (no global-pad slicing, no
# head transposes; flat_vit_attention blocks heads by column instead)
S_PADF = -(-S // 8) * 8
M_F = B_IMG * S_PADF
M_PADF = -(-M_F // (16 * GRID)) * 16 * GRID
N_FC1 = INTER // D_VIT
N_FC2 = INTER // D_VIT
assert 4 + N_FC1 + N_FC2 <= L_DEC

rng = np.random.default_rng(0)


def t(*shape, scale=0.05):
    return jnp.asarray(rng.normal(size=shape) * scale, DTYPE)


# decode-shaped stream: stacked decoder-MLP weights (zeros — throughput
# is value-independent and residual keeps the chain stable)
W1S = jnp.zeros((L_DEC, D_DEC, K2_DEC), DTYPE)
W2S = jnp.zeros((L_DEC, K2_DEC, D_DEC), DTYPE)
LNS = jnp.ones((L_DEC, D_DEC), DTYPE)

# stacked ViT layer params (random: parity must hold on real values)
VIT = {
    "ln1s": t(N_LAYERS, D_VIT, scale=1.0) + 1.0,
    "ln1b": t(N_LAYERS, D_VIT, scale=0.1),
    "wq": t(N_LAYERS, D_VIT, D_VIT), "bq": t(N_LAYERS, D_VIT, scale=0.1),
    "wk": t(N_LAYERS, D_VIT, D_VIT), "bk": t(N_LAYERS, D_VIT, scale=0.1),
    "wv": t(N_LAYERS, D_VIT, D_VIT), "bv": t(N_LAYERS, D_VIT, scale=0.1),
    "wo": t(N_LAYERS, D_VIT, D_VIT), "bo": t(N_LAYERS, D_VIT, scale=0.1),
    "ln2s": t(N_LAYERS, D_VIT, scale=1.0) + 1.0,
    "ln2b": t(N_LAYERS, D_VIT, scale=0.1),
    "w1": t(N_LAYERS, D_VIT, INTER), "b1": t(N_LAYERS, INTER, scale=0.1),
    "w2": t(N_LAYERS, INTER, D_VIT), "b2": t(N_LAYERS, D_VIT, scale=0.1),
}

X_DEC0 = t(B_DEC, D_DEC, scale=0.5)
_TOK0 = t(M_REAL, D_VIT, scale=0.5)
XW0 = jnp.pad(_TOK0, ((0, M_PAD - M_REAL), (0, 0)))
XW0_F = jnp.pad(
    jnp.pad(
        _TOK0.reshape(B_IMG, S, D_VIT), ((0, 0), (0, S_PADF - S), (0, 0))
    ).reshape(M_F, D_VIT),
    ((0, M_PADF - M_F), (0, 0)),
)


def _ln(x, s, b):
    x = x.astype(jnp.float32)
    mu = x.mean(-1, keepdims=True)
    var = jnp.maximum(0.0, (x * x).mean(-1, keepdims=True) - mu * mu)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * s + b


def _qgelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _attention(qb, kb, vb, glue="xla"):
    """(M_PAD, D) qkv buffers -> (M_PAD, D) merged attention output.
    fp32 softmax; pad rows never mix (attention is per-image).
    glue="kernel": the batched whole-sequence Pallas attention
    (ops/vit_attention.py, 0.32 vs 2.4 ms/layer in isolation) — the
    scores tensor stays in VMEM instead of a 135MB f32 HBM round-trip."""
    def sh(x):
        return (
            x[:M_REAL].reshape(B_IMG, S, H, DH).transpose(0, 2, 1, 3)
        )

    q, k, v = sh(qb), sh(kb), sh(vb)
    if glue == "kernel":
        from open_flamingo_tpu.ops.vit_attention import vit_attention

        out = vit_attention(
            q.reshape(B_IMG * H, S, DH),
            k.reshape(B_IMG * H, S, DH),
            v.reshape(B_IMG * H, S, DH),
            DH ** -0.5,
        ).reshape(B_IMG, H, S, DH)
    else:
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (DH ** -0.5)
        p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    merged = out.transpose(0, 2, 1, 3).reshape(M_REAL, D_VIT)
    return jnp.pad(merged, ((0, M_PAD - M_REAL), (0, 0)))


def _attention_flat(qb, kb, vb):
    """Flat-layout glue: (M_PADF, D) buffers -> (M_PADF, D) merged
    attention with ZERO transpose/pad copies — flat_vit_attention
    consumes the (B, S_PADF, D) view directly (free reshape when
    M_PADF == M_F; a row slice otherwise)."""
    from open_flamingo_tpu.ops.vit_attention import flat_vit_attention

    def to3(x):
        return x[:M_F].reshape(B_IMG, S_PADF, D_VIT)

    out = flat_vit_attention(
        to3(qb), to3(kb), to3(vb), DH ** -0.5, heads=H, s_real=S,
    ).reshape(M_F, D_VIT)
    if M_PADF == M_F:
        return out
    return jnp.pad(out, ((0, M_PADF - M_F), (0, 0)))


def vit_layer_ref(x, pv):
    """Plain-XLA CLIP ViT block (pre-LN, quick_gelu) on (M_PAD, D)."""
    h = _ln(x, pv["ln1s"], pv["ln1b"]).astype(x.dtype)
    qb = h @ pv["wq"] + pv["bq"]
    kb = h @ pv["wk"] + pv["bk"]
    vb = h @ pv["wv"] + pv["bv"]
    att = _attention(qb, kb, vb)
    x2 = x + att @ pv["wo"] + pv["bo"]
    h2 = _ln(x2, pv["ln2s"], pv["ln2b"]).astype(x.dtype)
    u = _qgelu((h2 @ pv["w1"] + pv["b1"]).astype(jnp.float32)).astype(x.dtype)
    return x2 + u @ pv["w2"] + pv["b2"]


def body(carry, pv, absorb: bool, glue: str = "xla"):
    """One decode step's stream launches; ViT layer pv rides as side
    tiles when absorb=True."""
    x_dec, xw = carry
    li_next = [0]

    def launch(**side_kw):
        nonlocal x_dec
        li = li_next[0]
        li_next[0] += 1
        r = fused_mlp(
            x_dec, W1S, W2S, ln_scale=LNS, act="gelu",
            residual=x_dec, layer_idx=li, block_k2=BLOCK_K2, **side_kw,
        )
        if side_kw:
            x_dec, so = r
            return so
        x_dec = r
        return None

    if absorb:
        ln1 = (pv["ln1s"], pv["ln1b"])
        qb = launch(side_x=xw, side_w=pv["wq"], side_ln=ln1,
                    side_b=pv["bq"])
        kb = launch(side_x=xw, side_w=pv["wk"], side_ln=ln1,
                    side_b=pv["bk"])
        vb = launch(side_x=xw, side_w=pv["wv"], side_ln=ln1,
                    side_b=pv["bv"])
        if glue == "flat":
            att = _attention_flat(qb, kb, vb)
        else:
            att = _attention(qb, kb, vb, glue=glue)
        x2 = launch(side_x=att, side_w=pv["wo"], side_b=pv["bo"],
                    side_residual=xw)
        ln2 = (pv["ln2s"], pv["ln2b"])
        hs = [
            launch(
                side_x=x2,
                side_w=jax.lax.slice_in_dim(pv["w1"], n * D_VIT,
                                            (n + 1) * D_VIT, axis=1),
                side_ln=ln2,
                side_b=jax.lax.slice_in_dim(pv["b1"], n * D_VIT,
                                            (n + 1) * D_VIT, axis=0),
            )
            for n in range(N_FC1)
        ]
        acc = x2
        for k in range(N_FC2):
            acc = launch(
                side_x=hs[k],
                side_w=jax.lax.slice_in_dim(pv["w2"], k * D_VIT,
                                            (k + 1) * D_VIT, axis=0),
                side_act="quick_gelu",
                side_b=pv["b2"] if k == 0 else None,
                side_residual=acc,
            )
        xw = acc
    while li_next[0] < L_DEC:
        launch()
    return (x_dec, xw), None


@functools.partial(jax.jit, static_argnames=("absorb", "glue"))
def run_scan(x_dec, xw, vit, absorb, glue="xla"):
    (x_dec, xw), _ = jax.lax.scan(
        functools.partial(body, absorb=absorb, glue=glue), (x_dec, xw),
        vit, length=N_LAYERS,
    )
    return x_dec, xw


@jax.jit
def run_vit_ref(xw, vit):
    xw, _ = jax.lax.scan(
        lambda x, pv: (vit_layer_ref(x, pv), None), xw, vit,
        length=N_LAYERS,
    )
    return xw


# --- parity ------------------------------------------------------------------
# Judge BOTH arms against an f32 reference: at bf16 the kernel path and
# the XLA path round in different places (the kernel keeps f32 through
# LN->matmul per tile; XLA chains bf16 ops), so over 24 layers they
# drift APART while each stays equally close to the f32 truth. A run on
# real TPU showed absorbed-vs-bf16ref rel 0.056 with both arms ~equal
# distance from f32 — symmetric rounding, not a schedule bug (the CPU
# f32 schedule parity is 5e-7).
xd_a, xw_a = run_scan(X_DEC0, XW0, VIT, absorb=True)
xw_ref = run_vit_ref(XW0, VIT)
vit32 = {k: v.astype(jnp.float32) for k, v in VIT.items()}
xw_f32 = run_vit_ref(XW0.astype(jnp.float32), vit32)
a = np.asarray(xw_a[:M_REAL], np.float32)
r = np.asarray(xw_ref[:M_REAL], np.float32)
f = np.asarray(xw_f32[:M_REAL], np.float32)
scale = max(np.abs(f).max(), 1e-6)
rel = np.abs(a - r).max() / scale
rel_a32 = np.abs(a - f).max() / scale
rel_r32 = np.abs(r - f).max() / scale
print(f"parity: absorbed-vs-bf16ref rel {rel:.4g}; vs f32 truth: "
      f"absorbed {rel_a32:.4g}, bf16 XLA ref {rel_r32:.4g}", flush=True)
if CPU:
    assert rel < 1e-4, f"absorbed ViT schedule diverges: rel {rel}"
else:
    assert rel_a32 < 2.0 * rel_r32 + 0.02, (
        f"absorbed arm is farther from f32 truth than symmetric "
        f"rounding allows: {rel_a32} vs bf16 ref {rel_r32}"
    )

xd_s, _ = run_scan(X_DEC0, XW0, VIT, absorb=False)
np.testing.assert_allclose(
    np.asarray(xd_a, np.float32), np.asarray(xd_s, np.float32),
    atol=1e-5,
)
print("main stream output identical with/without side work", flush=True)

def _extract_flat(xw_f):
    """(M_PADF, D) flat-layout workspace -> (M_REAL, D) real token rows."""
    return np.asarray(
        xw_f[:M_F], np.float32
    ).reshape(B_IMG, S_PADF, D_VIT)[:, :S].reshape(M_REAL, D_VIT)


if CPU:
    _, xw_k = run_scan(X_DEC0, XW0, VIT, absorb=True, glue="kernel")
    rel_k = (
        np.abs(np.asarray(xw_k[:M_REAL], np.float32) - r).max() / scale
    )
    assert rel_k < 1e-3, f"kernel-glue schedule diverges: rel {rel_k}"
    _, xw_fl = run_scan(X_DEC0, XW0_F, VIT, absorb=True, glue="flat")
    rel_f = np.abs(_extract_flat(xw_fl) - r).max() / scale
    assert rel_f < 1e-3, f"flat-glue schedule diverges: rel {rel_f}"
    print(json.dumps({
        "mode": "cpu", "parity_rel": float(rel),
        "kernel_glue_rel": float(rel_k),
        "flat_glue_rel": float(rel_f),
    }))
    sys.exit(0)


# --- perf --------------------------------------------------------------------
def timed(fn, *args, reps=7):
    np.asarray(jax.tree.leaves(fn(*args))[0][:1, :1])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(*args))[0][:1, :1])
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


# kernel-glue arm: parity first (same f32-truth gate), then timing
xd_k, xw_k = run_scan(X_DEC0, XW0, VIT, absorb=True, glue="kernel")
ak = np.asarray(xw_k[:M_REAL], np.float32)
rel_k32 = np.abs(ak - f).max() / scale
print(f"kernel-glue parity vs f32: {rel_k32:.4g}", flush=True)
assert rel_k32 < 2.0 * rel_r32 + 0.02

# flat-glue arm (round-5 lever (a)): zero-copy attention boundary
xd_fl, xw_fl = run_scan(X_DEC0, XW0_F, VIT, absorb=True, glue="flat")
rel_f32 = np.abs(_extract_flat(xw_fl) - f).max() / scale
print(f"flat-glue parity vs f32: {rel_f32:.4g}", flush=True)
assert rel_f32 < 2.0 * rel_r32 + 0.02

t_absorb = timed(lambda: run_scan(X_DEC0, XW0, VIT, absorb=True))
t_absorb_k = timed(
    lambda: run_scan(X_DEC0, XW0, VIT, absorb=True, glue="kernel")
)
t_absorb_f = timed(
    lambda: run_scan(X_DEC0, XW0_F, VIT, absorb=True, glue="flat")
)
t_stream = timed(lambda: run_scan(X_DEC0, XW0, VIT, absorb=False))
t_vit = timed(lambda: run_vit_ref(XW0, VIT))

out = {
    "stream_alone_ms": round(t_stream * 1e3, 2),
    "vit_xla_ms": round(t_vit * 1e3, 2),
    "serial_total_ms": round((t_stream + t_vit) * 1e3, 2),
    "absorbed_ms": round(t_absorb * 1e3, 2),
    "absorbed_kernel_glue_ms": round(t_absorb_k * 1e3, 2),
    "absorbed_flat_glue_ms": round(t_absorb_f * 1e3, 2),
    "absorb_overhead_flat_glue_ms": round(
        (t_absorb_f - t_stream) * 1e3, 2
    ),
    "net_saved_flat_glue_ms": round(
        (t_stream + t_vit - t_absorb_f) * 1e3, 2
    ),
    "flat_glue_rel_vs_f32": float(rel_f32),
    "net_saved_ms": round((t_stream + t_vit - t_absorb) * 1e3, 2),
    "net_saved_kernel_glue_ms": round(
        (t_stream + t_vit - t_absorb_k) * 1e3, 2
    ),
    "absorb_overhead_ms": round((t_absorb - t_stream) * 1e3, 2),
    "absorb_overhead_kernel_glue_ms": round(
        (t_absorb_k - t_stream) * 1e3, 2
    ),
    "parity_rel_vs_bf16ref": float(rel),
    "parity_rel_vs_f32": float(rel_a32),
    "bf16ref_rel_vs_f32": float(rel_r32),
    "kernel_glue_rel_vs_f32": float(rel_k32),
}
print(json.dumps(out))
