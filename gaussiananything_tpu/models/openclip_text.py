"""Faithful OpenAI-CLIP ViT-L/14 text tower in flax + the CLIP BPE tokenizer.

The reference's t23d conditioner is ``FrozenOpenCLIPEmbedder2(arch='ViT-L-14',
version='openai', layer='last', always_return_pooled=True, legacy=False)``
(`sgm/configs/stage1-t23d.yaml`; embedder at
`sgm/modules/encoders/modules.py:416-495`): crossattn context =
``ln_final(transformer(tok_emb + pos_emb))`` over a causal mask, pooled
vector = eot-token (argmax id) hidden state @ ``text_projection``.

This module mirrors that computation and the open_clip parameter tree
one-to-one (see `utils/param_io.openclip_text_name_map`) so a converted
torch checkpoint computes the same function. The tokenizer implements
CLIP's byte-level BPE (`open_clip/tokenizer.py` semantics); the merges
table (``bpe_simple_vocab_16e6.txt.gz``) is not shipped in this image, so
construction is gated on a local path — callers fall back to the byte
tokenizer in `models/conditioner.py` when no vocab is available.
"""
from __future__ import annotations

import functools
import gzip
import html
import re
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _quick_gelu(x):
    """openai-CLIP QuickGELU: x·σ(1.702x) (open_clip uses it for
    version='openai' checkpoints)."""
    return x * jax.nn.sigmoid(1.702 * x)


class ClipResBlock(nn.Module):
    """open_clip ResidualAttentionBlock: pre-LN attn (torch MHA fused
    in-proj) + pre-LN gelu MLP."""

    width: int
    heads: int
    quick_gelu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        B, L, D = x.shape
        dh = self.width // self.heads
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x)
        qkv = nn.Dense(3 * self.width, dtype=self.dtype,
                       name="attn.in_proj")(h)
        # torch F.multi_head_attention_forward packs [q; k; v] on the OUT dim
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, self.heads, dh)
        k = k.reshape(B, L, self.heads, dh)
        v = v.reshape(B, L, self.heads, dh)
        o = jax.nn.dot_product_attention(q, k, v, bias=mask)
        o = o.reshape(B, L, D)
        x = x + nn.Dense(self.width, dtype=self.dtype,
                         name="attn.out_proj")(o)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="mlp.c_fc")(h)
        h = _quick_gelu(h) if self.quick_gelu else nn.gelu(h,
                                                           approximate=False)
        h = nn.Dense(self.width, dtype=self.dtype, name="mlp.c_proj")(h)
        return x + h


class OpenClipTextTower(nn.Module):
    """Returns (tokens (B, L, width), pooled (B, embed)).

    Token semantics follow the release conditioner exactly
    (`FrozenOpenCLIPEmbedder2`, legacy=False, layer='last',
    `sgm/modules/encoders/modules.py:474-508`): the crossattn tokens are
    the last resblock's output WITHOUT ln_final (the dict entry
    `x['last']` is stored before `o = ln_final(o)` — a new variable — so
    the returned tokens stay unnormalised), while the pooled vector is
    ln_final → eot-gather → text_projection."""

    vocab: int = 49408
    width: int = 768
    depth: int = 12
    heads: int = 12
    max_len: int = 77
    embed_dim: int = 768
    quick_gelu: bool = True      # openai checkpoints use QuickGELU
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, L = token_ids.shape
        x = nn.Embed(self.vocab, self.width, dtype=self.dtype,
                     name="token_embedding")(token_ids)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (self.max_len, self.width))
        x = x + pos[None, :L].astype(self.dtype)
        # additive causal mask, matching open_clip build_causal_mask
        causal = jnp.where(
            jnp.tril(jnp.ones((L, L), bool)), 0.0, -jnp.inf
        ).astype(jnp.float32)[None, None]
        for i in range(self.depth):
            x = ClipResBlock(self.width, self.heads,
                             quick_gelu=self.quick_gelu, dtype=self.dtype,
                             name=f"resblocks.{i}")(x, causal)
        tokens = x                                     # pre-ln_final
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)
        proj = self.param("text_projection", nn.initializers.normal(0.01),
                          (self.width, self.embed_dim))
        eot = jnp.argmax(token_ids, axis=-1)
        pooled = jnp.take_along_axis(
            x, eot[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        pooled = pooled @ proj.astype(pooled.dtype)
        return tokens, pooled


# ---------------------------------------------------------------------------
# CLIP byte-level BPE tokenizer (open_clip SimpleTokenizer semantics).
# ---------------------------------------------------------------------------

@functools.lru_cache()
def bytes_to_unicode():
    """Reversible byte → printable-unicode map (GPT-2/CLIP standard)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


def _clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text)
    return text.strip().lower()


# CLIP's pattern uses \p{L}/\p{N}; stdlib `re` equivalents below cover the
# same classes via unicode-aware \w minus digits/underscore. The
# punctuation class is [^\s\p{L}\p{N}]+ in CLIP, which INCLUDES '_'
# (underscore is in \w, so a bare [^\s\w]+ would drop it entirely —
# 'sci_fi' must tokenise like 'sci<punct>fi', not 'scifi').
_PAT = re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[^\W\d_]+|\d|(?:[^\s\w]|_)+",
    re.IGNORECASE | re.UNICODE)


class ClipBPETokenizer:
    """CLIP BPE tokenizer from a local ``bpe_simple_vocab_16e6.txt.gz``.

    Vocabulary layout (49,408 tokens, matching open_clip): 256 byte symbols,
    256 byte+'</w>' symbols, 48,894 merge tokens, '<|startoftext|>',
    '<|endoftext|>'.
    """

    def __init__(self, bpe_path: str):
        opener = gzip.open if bpe_path.endswith(".gz") else open
        with opener(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = merges[1:49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        self.byte_encoder = bytes_to_unicode()
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        vocab.extend("".join(m) for m in merges)
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]
        self.cache = {}

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for tok in _PAT.findall(_clean(text)):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(tok).split(" "))
        return ids

    def __call__(self, texts: Sequence[str], max_len: int = 77) -> np.ndarray:
        """open_clip.tokenize parity: sot + ids + eot, truncate keeping eot."""
        out = np.zeros((len(texts), max_len), np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot] + self.encode(t) + [self.eot]
            if len(ids) > max_len:
                ids = ids[:max_len]
                ids[-1] = self.eot
            out[i, :len(ids)] = ids
        return out


def load_clip_tokenizer(bpe_path: Optional[str]) -> Optional[ClipBPETokenizer]:
    """Gated loader: None when no vocab file is available (fall back to the
    byte tokenizer)."""
    if bpe_path is None:
        return None
    import os
    if not os.path.exists(bpe_path):
        raise FileNotFoundError(
            f"CLIP BPE vocab not found at {bpe_path}; download "
            "bpe_simple_vocab_16e6.txt.gz (openai/CLIP) and point "
            "clip_bpe_path at it, or use the byte tokenizer.")
    return ClipBPETokenizer(bpe_path)
