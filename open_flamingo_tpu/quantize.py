"""Post-load int8 quantization of the decode-streamed LM weights.

Single-token decode is weight-DMA-bound (~4.9 GB/token for OF-3B at
bf16, BASELINE.md roofline); per-channel symmetric int8 halves the
stream. This module builds a side-car `qparams` variable collection
mirroring the `params` tree: for every decode-streamed matrix it stores
the int8 copy + a per-out-channel fp32 scale, which the fused decode
kernels (ops/dense_stream.py, ops/decode_layer.py) consume via
`PDense.stream_weight()`. The bf16 originals stay in `params` — prefill,
training, and every non-fused path are untouched, and quantization is
opt-in per apply (just pass the augmented variables dict).

Replaced torch path: none — the reference decodes fp32/bf16 only
(open_flamingo/src/flamingo.py:124-175); this is TPU-roofline work.

Usage:
    variables = quantize_decode_params(variables)   # adds "qparams"
    out = flamingo_generate(model, variables, ...)  # kernels go int8
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

# PDense module names whose `kernel` streams through the fused decode
# kernels, per family: mpt (Wqkv/out_proj/up_proj/down_proj), gptneox
# (query_key_value/dense/dense_h_to_4h/dense_4h_to_h), llama
# (q/k/v/o_proj, gate_proj/up_proj/down_proj), gptj (q/k/v/out_proj,
# fc_in/fc_out), opt (q/k/v/out_proj, fc1/fc2), gated xattn
# (to_q/to_out, ff fc1/fc2). `to_kv` is excluded: media K/V is
# projected once at prefill, never streamed during decode.
QUANT_PARENTS = frozenset({
    "Wqkv", "out_proj", "up_proj", "down_proj",
    "query_key_value", "dense", "dense_h_to_4h", "dense_4h_to_h",
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
    "fc_in", "fc_out",
    "fc1", "fc2",
    "to_q", "to_out",
    "lm_head",
})


def quantize_weight(w, axis: int, bits: int = 8):
    """Per-channel symmetric int8/int4-grid: reduce |w| over `axis`
    (the in-features/reduction axis), keep every other axis as channel
    dims. Returns (w_q int8 same shape, scale f32 with `axis` removed).
    Pure-jnp so it runs on-device (jit-able: quantizing placed params
    never copies them to the host) and accepts numpy too.

    bits=4 clips to the int4 grid [-7, 7] but STORES int8: S4 arrays
    cannot cross a jit boundary on the remote-TPU (axon) backend, so
    the packed jnp.int4 copy is materialized in-graph per generate call
    by activate_int4_stream — the decode loop then streams 2-per-byte
    packed int4 at half the int8 DMA (on-TPU A/B, BASELINE.md round 4:
    OF-3B B=32 scan decode 4,020 tok/s int4 vs 3,445 int8 serial)."""
    assert bits in (8, 4), bits
    qmax = 127 if bits == 8 else 7
    w = jnp.asarray(w).astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=axis)
    scale = jnp.where(amax == 0.0, 1.0, amax / qmax)
    w_q = jnp.clip(
        jnp.round(w / jnp.expand_dims(scale, axis)), -qmax, qmax
    ).astype(jnp.int8)
    return w_q, scale


def _quantize_lm_tree(tree: Dict[str, Any], bits: int = 8) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for name, sub in tree.items():
        if not isinstance(sub, dict):
            continue
        if name in QUANT_PARENTS and "kernel" in sub:
            k = sub["kernel"]
            # kernels are (K, N) or scan-stacked (G, K, N); out-channels
            # are the LAST axis -> reduce over the in-features axis -2.
            # The vocab head stays int8 even in int4 mode: logits are
            # the most quantization-sensitive site and the head is a
            # one-off per step (not a per-layer stream).
            k_bits = 8 if name == "lm_head" else bits
            q, s = quantize_weight(k, axis=k.ndim - 2, bits=k_bits)
            qkey = "kernel_q4" if k_bits == 4 else "kernel_q"
            out[name] = {qkey: q, "kernel_s": s}
        elif name == "wte" and "embedding" in sub:
            # tied-embedding logits stream the (V, D) table transposed:
            # out-channels are the vocab rows -> reduce over D (last).
            # Kept int8 in int4 mode (see lm_head above).
            e = sub["embedding"]
            q, s = quantize_weight(e, axis=e.ndim - 1, bits=8)
            out[name] = {"embedding_q": q, "embedding_s": s}
        else:
            child = _quantize_lm_tree(sub, bits)
            if child:
                out[name] = child
    return out


def quantize_decode_params(
    variables: Dict[str, Any], bits: int = 8
) -> Dict[str, Any]:
    """Add a `qparams` collection with int8 (bits=8) or int4 (bits=4)
    copies of the LM's decode-streamed weights. `variables` is the dict
    `model.init` returns ({"params": ...}); only the `lm` subtree is
    quantized (the ViT/perceiver never run during decode steps). For
    scan_layers models, call AFTER `to_scanned_layout` (stacked 3D
    kernels are quantized per layer). bits=4 quarters the per-token
    weight DMA (vocab head/embeddings stay int8); quality is coarser —
    opt-in via --int4_decode, gate on the measured drift."""
    params = variables["params"]
    lm = params.get("lm")
    if lm is None:
        raise ValueError("variables['params'] has no 'lm' subtree")
    return {**variables, "qparams": {"lm": _quantize_lm_tree(lm, bits)}}


def activate_int4_stream(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Materialize the packed jnp.int4 decode stream from the int8-
    stored int4-grid side-car (`kernel_q4`, quantize_decode_params
    bits=4): every kernel_q4 leaf becomes a true int4 `kernel_q`, which
    PDense.stream_weight and the fused decode kernels consume unchanged.

    MUST run IN-GRAPH (inside the jitted generate/serving fn, before
    the decode loop): S4 arrays cannot cross a jit boundary on the
    remote-TPU (axon) backend, and the cast is loop-invariant so XLA
    executes it once per call, not per decode step. No-op when no
    kernel_q4 leaves exist (int8 mode / unquantized).

    The int8-stored copy stays in the tree (same input buffer — no
    extra HBM): the W8A8 prefill path (--int8_prefill) consumes it on
    the int8 MXU with the same int4-grid scales, so int4 decode and
    W8A8 prefill compose (PDense.__call__ prefers kernel_q when int8,
    else kernel_q4)."""
    q = variables.get("qparams")
    if q is None:
        return variables

    found = False

    def walk(t):
        nonlocal found
        out = {}
        for k, v in t.items():
            out[k] = walk(v) if isinstance(v, dict) else v
        if "kernel_q4" in out:
            found = True
            out["kernel_q"] = out["kernel_q4"].astype(jnp.int4)
        return out

    walked = walk(q)
    return {**variables, "qparams": walked} if found else variables


def quantize_prefill_params(
    variables: Dict[str, Any], bits: int = 8
) -> Dict[str, Any]:
    """Extend the `qparams` side-car to the ViT blocks so the W8A8
    prefill path (ops/w8a8.py, --int8_prefill) covers the vision
    forward too — q/k/v/out_proj/fc1/fc2 per block (patch_embed and the
    attention einsums stay bf16). Composes with
    quantize_decode_params (the LM side of W8A8 reuses the same int8
    decode weights). bits=4 puts the LM on the int4 grid (int4 decode
    stream + W8A8 prefill over the same int4-grid values); the ViT
    side-car stays int8 either way."""
    variables = quantize_decode_params(variables, bits=bits)
    # the qparams tree must mirror the params tree path exactly —
    # Flamingo names the ViT subtree "vision_encoder" (models/flamingo.py)
    vision = variables["params"].get("vision_encoder")
    qparams = dict(variables["qparams"])
    if vision is not None:
        qparams["vision_encoder"] = _quantize_lm_tree(vision)
    return {**variables, "qparams": qparams}


def strip_resident_params(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Drop the bf16 copy of every quantized kernel so ONLY the int8
    side-car stays resident in HBM — int8-resident serving. OF-9B
    (MPT-7B, ~18 GB bf16) fits a single 16 GB v5e this way: ~8.4 GB of
    int8 weights + the bf16 embedding table/LNs/biases + caches.

    Requires a `qparams` side-car (quantize_decode_params /
    quantize_prefill_params). Consumers adapt automatically: decode
    kernels stream the int8 copy (they already prefer it), W8A8 prefill
    uses it on the int8 MXU path, and any remaining dense site
    dequantizes in-graph (PDense._dense_kernel — transient, fused, no
    resident bf16). The embedding table (`wte.embedding`) is KEPT: the
    input gather reads it directly. Single-chip only (the TP einsum
    path reads bf16 kernels).

    Replaced torch path: none — the reference cannot fit OF-9B decode
    on a 16 GB device at all."""
    if "qparams" not in variables:
        raise ValueError("strip_resident_params needs a qparams side-car")

    def walk(p: Dict[str, Any], q: Dict[str, Any]) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for name, sub in p.items():
            qs = q.get(name) if isinstance(q, dict) else None
            if (
                isinstance(sub, dict)
                and isinstance(qs, dict)
                and "kernel_q" in qs
                and "kernel" in sub
            ):
                out[name] = {k: v for k, v in sub.items() if k != "kernel"}
            elif isinstance(sub, dict) and isinstance(qs, dict):
                out[name] = walk(sub, qs)
            else:
                out[name] = sub
        return out

    params = dict(variables["params"])
    for top, qtop in variables["qparams"].items():
        if top in params:
            params[top] = walk(params[top], qtop)
    return {**variables, "params": params}


def dequantize_roundtrip(
    variables: Dict[str, Any], bits: int = 8
) -> Dict[str, Any]:
    """Replace every quantizable weight with dequant(quant(w)) so the
    int8/int4 path is EXACT against the bf16 path on the same params —
    the plumbing-correctness test harness (tests/test_quantize.py)."""

    def walk(tree):
        out = {}
        for name, sub in tree.items():
            if not isinstance(sub, dict):
                out[name] = sub
                continue
            if name in QUANT_PARENTS and "kernel" in sub:
                k = jnp.asarray(sub["kernel"])
                k_bits = 8 if name == "lm_head" else bits
                q, s = quantize_weight(k, axis=k.ndim - 2, bits=k_bits)
                deq = q.astype(jnp.float32) * jnp.expand_dims(s, k.ndim - 2)
                out[name] = {**sub, "kernel": deq.astype(k.dtype)}
            elif name == "wte" and "embedding" in sub:
                e = jnp.asarray(sub["embedding"])
                q, s = quantize_weight(e, axis=e.ndim - 1, bits=8)
                deq = q.astype(jnp.float32) * jnp.expand_dims(s, e.ndim - 1)
                out[name] = {**sub, "embedding": deq.astype(e.dtype)}
            else:
                out[name] = walk(sub)
        return out

    params = dict(variables["params"])
    params["lm"] = walk(params["lm"])
    return {**variables, "params": params}
