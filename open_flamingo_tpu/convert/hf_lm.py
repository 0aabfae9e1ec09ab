"""HF CausalLM checkpoint -> FlamingoLM param pytree converters.

Replaces the reference's direct use of HF torch modules
(open_flamingo/src/factory.py:65-70): we convert weights once into JAX
pytrees and run our own TPU-native decoders. Works from a state_dict of
numpy arrays, so torch is only needed by the caller, not this module.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from ..models.decoders.common import DecoderConfig

Array = Any


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (out, in) -> flax Dense kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def to_numpy_state_dict(model_or_sd) -> Dict[str, np.ndarray]:
    """Accept a torch nn.Module or mapping of tensors/arrays."""
    if hasattr(model_or_sd, "state_dict"):
        sd = model_or_sd.state_dict()
    else:
        sd = model_or_sd
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().float().numpy()
        out[k] = np.asarray(v)
    return out


def config_from_hf(hf_config) -> DecoderConfig:
    """Build a DecoderConfig from an HF config object."""
    mt = hf_config.model_type
    if mt == "mpt":
        return DecoderConfig(
            family="mpt",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            num_layers=hf_config.n_layers,
            num_heads=hf_config.n_heads,
            intermediate_size=4 * hf_config.hidden_size,
            max_position_embeddings=hf_config.max_seq_len,
            layer_norm_eps=hf_config.layer_norm_epsilon,
            alibi=True,
            alibi_bias_max=getattr(hf_config.attn_config, "alibi_bias_max", 8),
            clip_qkv=getattr(hf_config.attn_config, "clip_qkv", None),
            attention_bias=False,
            tie_word_embeddings=True,
            ln_no_bias=True,
        )
    if mt == "gpt_neox":
        return DecoderConfig(
            family="gptneox",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            intermediate_size=hf_config.intermediate_size,
            max_position_embeddings=hf_config.max_position_embeddings,
            layer_norm_eps=hf_config.layer_norm_eps,
            rotary_pct=hf_config.rotary_pct,
            rope_theta=hf_config.rotary_emb_base,
            use_parallel_residual=hf_config.use_parallel_residual,
            attention_bias=True,
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings", False),
        )
    if mt == "llama":
        return DecoderConfig(
            family="llama",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads", None),
            intermediate_size=hf_config.intermediate_size,
            max_position_embeddings=hf_config.max_position_embeddings,
            layer_norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            attention_bias=getattr(hf_config, "attention_bias", False),
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings", False),
            hidden_act="silu",
        )
    if mt == "gptj":
        return DecoderConfig(
            family="gptj",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.n_embd,
            num_layers=hf_config.n_layer,
            num_heads=hf_config.n_head,
            intermediate_size=hf_config.n_inner or 4 * hf_config.n_embd,
            max_position_embeddings=hf_config.n_positions,
            layer_norm_eps=hf_config.layer_norm_epsilon,
            rotary_dim=hf_config.rotary_dim,
            attention_bias=False,
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings", False),
            lm_head_bias=True,
            # GPT-J-6B ships activation_function="gelu_new" (tanh approx)
            hidden_act=getattr(hf_config, "activation_function", "gelu_new"),
        )
    if mt == "opt":
        return DecoderConfig(
            family="opt",
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            intermediate_size=hf_config.ffn_dim,
            max_position_embeddings=hf_config.max_position_embeddings,
            attention_bias=True,
            tie_word_embeddings=True,
        )
    raise ValueError(f"unsupported HF model_type: {mt}")


def convert_lm_params(
    sd: Mapping[str, np.ndarray], cfg: DecoderConfig
) -> Dict[str, Any]:
    """Convert an HF CausalLM state_dict to FlamingoLM params (no xattn)."""
    sd = to_numpy_state_dict(sd)
    if cfg.family == "mpt":
        return _convert_mpt(sd, cfg)
    if cfg.family == "gptneox":
        return _convert_gptneox(sd, cfg)
    if cfg.family == "llama":
        return _convert_llama(sd, cfg)
    if cfg.family == "gptj":
        return _convert_gptj(sd, cfg)
    if cfg.family == "opt":
        return _convert_opt(sd, cfg)
    raise ValueError(cfg.family)


def _ln(sd, prefix, no_bias=False):
    p = {"scale": sd[prefix + ".weight"]}
    if not no_bias and prefix + ".bias" in sd:
        p["bias"] = sd[prefix + ".bias"]
    return p


def _linear(sd, prefix, bias=True):
    p = {"kernel": _t(sd[prefix + ".weight"])}
    if bias and prefix + ".bias" in sd:
        p["bias"] = sd[prefix + ".bias"]
    return p


def _convert_mpt(sd, cfg):
    # HF MptForCausalLM ("transformer." prefix) or mosaicml mosaic_gpt
    pre = "transformer." if "transformer.wte.weight" in sd else ""
    params: Dict[str, Any] = {"wte": {"embedding": sd[pre + "wte.weight"]}}
    for i in range(cfg.num_layers):
        b = f"{pre}blocks.{i}."
        # mosaic_gpt names: ln_1/ln_2, attn.Wqkv/attn.out_proj, mlp.mlp_up/mlp.mlp_down
        n1 = b + ("norm_1" if b + "norm_1.weight" in sd else "ln_1")
        n2 = b + ("norm_2" if b + "norm_2.weight" in sd else "ln_2")
        up = b + ("ffn.up_proj" if b + "ffn.up_proj.weight" in sd else "mlp.mlp_up")
        down = (
            b + ("ffn.down_proj" if b + "ffn.down_proj.weight" in sd else "mlp.mlp_down")
        )
        params[f"blocks_{i}"] = {
            "norm_1": _ln(sd, n1, no_bias=cfg.ln_no_bias),
            "Wqkv": _linear(sd, b + "attn.Wqkv", bias=False),
            "out_proj": _linear(sd, b + "attn.out_proj", bias=False),
            "norm_2": _ln(sd, n2, no_bias=cfg.ln_no_bias),
            "up_proj": _linear(sd, up, bias=False),
            "down_proj": _linear(sd, down, bias=False),
        }
    nf = pre + ("norm_f" if pre + "norm_f.weight" in sd else "ln_f")
    params["norm_f"] = _ln(sd, nf, no_bias=cfg.ln_no_bias)
    return params


def _convert_gptneox(sd, cfg):
    pre = "gpt_neox." if "gpt_neox.embed_in.weight" in sd else ""
    params: Dict[str, Any] = {"wte": {"embedding": sd[pre + "embed_in.weight"]}}
    for i in range(cfg.num_layers):
        b = f"{pre}layers.{i}."
        params[f"blocks_{i}"] = {
            "input_layernorm": _ln(sd, b + "input_layernorm"),
            "query_key_value": _linear(sd, b + "attention.query_key_value"),
            "dense": _linear(sd, b + "attention.dense"),
            "post_attention_layernorm": _ln(sd, b + "post_attention_layernorm"),
            "dense_h_to_4h": _linear(sd, b + "mlp.dense_h_to_4h"),
            "dense_4h_to_h": _linear(sd, b + "mlp.dense_4h_to_h"),
        }
    params["norm_f"] = _ln(sd, pre + "final_layer_norm")
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": _t(sd["embed_out.weight"])}
    return params


def _convert_gptj(sd, cfg):
    pre = "transformer." if "transformer.wte.weight" in sd else ""
    params: Dict[str, Any] = {"wte": {"embedding": sd[pre + "wte.weight"]}}
    for i in range(cfg.num_layers):
        b = f"{pre}h.{i}."
        params[f"blocks_{i}"] = {
            "ln_1": _ln(sd, b + "ln_1"),
            "q_proj": _linear(sd, b + "attn.q_proj", False),
            "k_proj": _linear(sd, b + "attn.k_proj", False),
            "v_proj": _linear(sd, b + "attn.v_proj", False),
            "out_proj": _linear(sd, b + "attn.out_proj", False),
            "fc_in": _linear(sd, b + "mlp.fc_in"),
            "fc_out": _linear(sd, b + "mlp.fc_out"),
        }
    params["norm_f"] = _ln(sd, pre + "ln_f")
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _linear(sd, "lm_head")
    return params


def _convert_opt(sd, cfg):
    pre = "model.decoder." if "model.decoder.embed_tokens.weight" in sd else (
        "decoder." if "decoder.embed_tokens.weight" in sd else ""
    )
    params: Dict[str, Any] = {
        "wte": {"embedding": sd[pre + "embed_tokens.weight"]},
        "wpe": {"embedding": sd[pre + "embed_positions.weight"]},
    }
    for i in range(cfg.num_layers):
        b = f"{pre}layers.{i}."
        params[f"blocks_{i}"] = {
            "self_attn_layer_norm": _ln(sd, b + "self_attn_layer_norm"),
            "q_proj": _linear(sd, b + "self_attn.q_proj"),
            "k_proj": _linear(sd, b + "self_attn.k_proj"),
            "v_proj": _linear(sd, b + "self_attn.v_proj"),
            "out_proj": _linear(sd, b + "self_attn.out_proj"),
            "final_layer_norm": _ln(sd, b + "final_layer_norm"),
            "fc1": _linear(sd, b + "fc1"),
            "fc2": _linear(sd, b + "fc2"),
        }
    params["norm_f"] = _ln(sd, pre + "final_layer_norm")
    return params


def _convert_llama(sd, cfg):
    pre = "model." if "model.embed_tokens.weight" in sd else ""
    params: Dict[str, Any] = {
        "wte": {"embedding": sd[pre + "embed_tokens.weight"]}
    }
    for i in range(cfg.num_layers):
        b = f"{pre}layers.{i}."
        params[f"blocks_{i}"] = {
            "input_layernorm": {"scale": sd[b + "input_layernorm.weight"]},
            "q_proj": _linear(sd, b + "self_attn.q_proj", cfg.attention_bias),
            "k_proj": _linear(sd, b + "self_attn.k_proj", cfg.attention_bias),
            "v_proj": _linear(sd, b + "self_attn.v_proj", cfg.attention_bias),
            "o_proj": _linear(sd, b + "self_attn.o_proj", cfg.attention_bias),
            "post_attention_layernorm": {
                "scale": sd[b + "post_attention_layernorm.weight"]
            },
            "gate_proj": _linear(sd, b + "mlp.gate_proj", False),
            "up_proj": _linear(sd, b + "mlp.up_proj", False),
            "down_proj": _linear(sd, b + "mlp.down_proj", False),
        }
    params["norm_f"] = {"scale": sd[pre + "norm.weight"]}
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": _t(sd["lm_head.weight"])}
    return params
