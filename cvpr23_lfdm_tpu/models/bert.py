"""Pure-JAX BERT encoder for on-device free-text conditioning.

Reference: DM/modules/text.py — a frozen HF `bert-base-cased` whose masked
token-mean (excluding [CLS]) is the 768-d conditioning vector. The cached
class-embedding table (models/text.py) covers the published datasets; this
module removes the torch/HF dependency from the serving path for ARBITRARY
text: convert the HF checkpoint once with `convert_hf_bert`, tokenize on
host, and run the encoder under jit on the TPU.

Implements the exact BertModel forward (post-LN encoder, GELU, learned
positions, attention mask as additive -inf) — parity-tested against a
torch `transformers.BertModel` with shared random weights.
"""

from __future__ import annotations

import dataclasses
import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BertSpec:
    vocab_size: int = 28996  # bert-base-cased
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12


class BertLayer(nn.Module):
    spec: BertSpec

    @nn.compact
    def __call__(self, x, attn_bias):
        s = self.spec
        h = s.num_heads
        d = s.hidden_size // h
        b, n, _ = x.shape

        def heads(t):
            return t.reshape(b, n, h, d).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(s.hidden_size, name="query")(x))
        k = heads(nn.Dense(s.hidden_size, name="key")(x))
        v = heads(nn.Dense(s.hidden_size, name="value")(x))
        sim = jnp.einsum("bhid,bhjd->bhij", q, k) / np.sqrt(d)
        sim = sim + attn_bias  # [B, 1, 1, N] additive mask
        attn = nn.softmax(sim, axis=-1)
        ctx = jnp.einsum("bhij,bhjd->bhid", attn, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, s.hidden_size)
        attn_out = nn.Dense(s.hidden_size, name="attn_out")(ctx)
        x = nn.LayerNorm(epsilon=s.layer_norm_eps, name="attn_ln")(x + attn_out)

        inter = nn.gelu(
            nn.Dense(s.intermediate_size, name="intermediate")(x),
            approximate=False,
        )
        out = nn.Dense(s.hidden_size, name="output")(inter)
        return nn.LayerNorm(epsilon=s.layer_norm_eps, name="out_ln")(x + out)


class BertEncoder(nn.Module):
    spec: BertSpec = BertSpec()

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        """input_ids `[B, N]` int32 -> final hidden states `[B, N, H]`."""
        s = self.spec
        b, n = input_ids.shape
        if attention_mask is None:
            attention_mask = (input_ids != 0).astype(jnp.float32)
        x = nn.Embed(s.vocab_size, s.hidden_size, name="word_embeddings")(input_ids)
        pos = jnp.arange(n)[None]
        x = x + nn.Embed(
            s.max_position_embeddings, s.hidden_size, name="position_embeddings"
        )(pos)
        x = x + nn.Embed(
            s.type_vocab_size, s.hidden_size, name="token_type_embeddings"
        )(jnp.zeros_like(input_ids))
        x = nn.LayerNorm(epsilon=s.layer_norm_eps, name="embeddings_ln")(x)
        attn_bias = (1.0 - attention_mask[:, None, None, :]) * -1e9
        for i in range(s.num_layers):
            x = BertLayer(s, name=f"layer_{i}")(x, attn_bias)
        return x


@functools.lru_cache(maxsize=4)
def _jitted_embed(spec: BertSpec):
    """One jitted forward per spec (eager 12-layer dispatch is ~ms/op over
    tunneled devices); jit re-specializes per padded sequence length."""

    @jax.jit
    def run(params, input_ids):
        hidden = BertEncoder(spec).apply({"params": params}, input_ids)
        mask = (input_ids != 0).astype(hidden.dtype)[:, 1:, None]
        num = (hidden[:, 1:] * mask).sum(axis=1)
        den = mask.sum(axis=1)
        return num / (den + 1e-8)

    return run


def bert_embed(params, input_ids, spec: BertSpec = BertSpec()) -> jnp.ndarray:
    """Reference `bert_embed` semantics (DM/modules/text.py:56-89): final
    hidden states, masked mean over tokens EXCLUDING [CLS], eps 1e-8."""
    input_ids = jnp.asarray(input_ids)
    assert input_ids.shape[1] <= spec.max_position_embeddings, (
        "sequence longer than max_position_embeddings — tokenize with "
        "truncation"
    )
    return _jitted_embed(spec)(params, input_ids)


def convert_hf_bert(sd: dict, spec: BertSpec = BertSpec()) -> dict:
    """HF `BertModel.state_dict()` (tensors or numpy) -> BertEncoder params.
    The pooler is unused (the reference takes hidden states)."""

    def w(key):
        t = sd[key]
        return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()

    def dense(prefix):
        return {"kernel": w(prefix + ".weight").T, "bias": w(prefix + ".bias")}

    def ln(prefix):
        return {"scale": w(prefix + ".weight"), "bias": w(prefix + ".bias")}

    params = {
        "word_embeddings": {"embedding": w("embeddings.word_embeddings.weight")},
        "position_embeddings": {
            "embedding": w("embeddings.position_embeddings.weight")
        },
        "token_type_embeddings": {
            "embedding": w("embeddings.token_type_embeddings.weight")
        },
        "embeddings_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(spec.num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "query": dense(f"{p}.attention.self.query"),
            "key": dense(f"{p}.attention.self.key"),
            "value": dense(f"{p}.attention.self.value"),
            "attn_out": dense(f"{p}.attention.output.dense"),
            "attn_ln": ln(f"{p}.attention.output.LayerNorm"),
            "intermediate": dense(f"{p}.intermediate.dense"),
            "output": dense(f"{p}.output.dense"),
            "out_ln": ln(f"{p}.output.LayerNorm"),
        }
    return params
