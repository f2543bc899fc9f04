"""Pure-numpy DistilBERT masked-LM backend — the sanctioned fallback
for the sandbox's missing torch (VERDICT r3 item 1): the model math is
a few matmuls, so the ENTIRE forward path — embeddings → multi-head
attention → GELU FFN → post-LayerNorms → MLM head — runs and is tested
here without torch or transformers. Given a real exported checkpoint
directory (``model.safetensors`` + ``vocab.txt`` + ``config.json``,
producible on any torch machine with ``model.save_pretrained(dir,
safe_serialization=True)`` / ``tokenizer.save_vocabulary(dir)``), this
backend scores the reference's relations for content-level parity; in
tests a tiny random-weight checkpoint exercises every line.

Architecture follows the public DistilBERT paper (Sanh et al. 2019)
and the HF reference implementation's documented layer layout
(post-LayerNorm residual blocks, learned positions, no token types;
MLM head = vocab_transform → GELU → vocab_layer_norm →
vocab_projector; LayerNorm eps 1e-12; exact-erf GELU). Weight names
are the checkpoint's own (``distilbert.embeddings...``,
``vocab_projector...``); linear weights are [out, in] as PyTorch
stores them.

``erf`` is W. J. Cody's rational Chebyshev approximation (Cody 1969,
netlib CALERF — the same algorithm libm uses), vectorized in numpy and
pinned to ``math.erf`` at ≤4 ulp by tests: the sandbox has no
``scipy``/``np.erf``, and a tanh-approximation GELU would break
content parity.
"""

from __future__ import annotations

import json
import os
import unicodedata
from collections.abc import Sequence

import numpy as np

from ..functions.stopwords import STOPWORD_SET
from .hf import HFMaskedLM
from .safetensors_io import load_file

# ---------------------------------------------------------------------------
# erf / gelu / layernorm kernels
# ---------------------------------------------------------------------------

_ERF_A = (3.16112374387056560e0, 1.13864154151050156e2,
          3.77485237685302021e2, 3.20937758913846947e3,
          1.85777706184603153e-1)
_ERF_B = (2.36012909523441209e1, 2.44024637934444173e2,
          1.28261652607737228e3, 2.84423683343917062e3)
_ERF_C = (5.64188496988670089e-1, 8.88314979438837594e0,
          6.61191906371416295e1, 2.98635138197400131e2,
          8.81952221241769090e2, 1.71204761263407058e3,
          2.05107837782607147e3, 1.23033935479799725e3,
          2.15311535474403846e-8)
_ERF_D = (1.57449261107098347e1, 1.17693950891312499e2,
          5.37181101862009858e2, 1.62138957456669019e3,
          3.29079923573345963e3, 4.36261909014324716e3,
          3.43936767414372164e3, 1.23033935480374942e3)
_ERF_P = (3.05326634961232344e-1, 3.60344899949804439e-1,
          1.25781726111229246e-1, 1.60837851487422766e-2,
          6.58749161529837803e-4, 1.63153871373020978e-2)
_ERF_Q = (2.56852019228982242e0, 1.87295284992346047e0,
          5.27905102951428412e-1, 6.05183413124413191e-2,
          2.33520497626869185e-3)
_SQRPI = 5.6418958354775628695e-1  # 1/sqrt(pi)


def erf(x: np.ndarray) -> np.ndarray:
    """Vectorized double-precision erf (Cody's CALERF regions)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.abs(x)
    out = np.empty_like(y)

    m1 = y <= 0.46875
    if m1.any():
        z = np.where(y[m1] > 1.11e-16, y[m1] * y[m1], 0.0)
        num = _ERF_A[4] * z
        den = z
        for i in range(3):
            num = (num + _ERF_A[i]) * z
            den = (den + _ERF_B[i]) * z
        out[m1] = x[m1] * (num + _ERF_A[3]) / (den + _ERF_B[3])

    m2 = (y > 0.46875) & (y <= 4.0)
    if m2.any():
        yy = y[m2]
        num = _ERF_C[8] * yy
        den = yy
        for i in range(7):
            num = (num + _ERF_C[i]) * yy
            den = (den + _ERF_D[i]) * yy
        res = (num + _ERF_C[7]) / (den + _ERF_D[7])
        ysq = np.floor(yy * 16.0) / 16.0
        delta = (yy - ysq) * (yy + ysq)
        erfc = np.exp(-ysq * ysq) * np.exp(-delta) * res
        out[m2] = np.sign(x[m2]) * (1.0 - erfc)

    m3 = y > 4.0
    if m3.any():
        yy = y[m3]
        z = 1.0 / (yy * yy)
        num = _ERF_P[5] * z
        den = z
        for i in range(4):
            num = (num + _ERF_P[i]) * z
            den = (den + _ERF_Q[i]) * z
        res = z * (num + _ERF_P[4]) / (den + _ERF_Q[4])
        res = (_SQRPI - res) / yy
        ysq = np.floor(yy * 16.0) / 16.0
        delta = (yy - ysq) * (yy + ysq)
        with np.errstate(under="ignore"):
            erfc = np.exp(-ysq * ysq) * np.exp(-delta) * res
        out[m3] = np.sign(x[m3]) * (1.0 - erfc)
    return out


def gelu(x: np.ndarray) -> np.ndarray:
    """Exact-erf GELU (what HF uses for DistilBERT's "gelu")."""
    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def layer_norm(x: np.ndarray, w: np.ndarray, b: np.ndarray,
               eps: float = 1e-12) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _linear(x: np.ndarray, w: np.ndarray, b: np.ndarray) -> np.ndarray:
    return x @ w.T + b


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


# ---------------------------------------------------------------------------
# DistilBERT forward
# ---------------------------------------------------------------------------

REQUIRED_CONFIG = ("dim", "n_layers", "n_heads", "hidden_dim",
                   "vocab_size", "max_position_embeddings")


def distilbert_forward(
    weights: dict[str, np.ndarray],
    config: dict,
    input_ids: np.ndarray,
    attention_mask: np.ndarray,
) -> np.ndarray:
    """[B, L] ids + mask → [B, L, vocab] MLM logits, float64.

    Padded *key* positions are masked out of every attention softmax;
    padded *query* rows produce garbage (exactly as the torch model —
    callers index real positions only)."""
    w = weights
    ids = np.asarray(input_ids, dtype=np.int64)
    mask = np.asarray(attention_mask, dtype=np.float64)
    B, L = ids.shape
    dim, n_heads = config["dim"], config["n_heads"]
    dh = dim // n_heads

    emb = (
        w["distilbert.embeddings.word_embeddings.weight"][ids]
        + w["distilbert.embeddings.position_embeddings.weight"][:L][None, :, :]
    )
    x = layer_norm(
        emb,
        w["distilbert.embeddings.LayerNorm.weight"],
        w["distilbert.embeddings.LayerNorm.bias"],
    )

    # scores for masked-out KEYS get a large negative constant (the
    # torch impl uses finfo.min): exp underflows to exactly 0
    neg = -1e30 * (1.0 - mask)[:, None, None, :]  # [B,1,1,L]

    def heads(t):  # [B,L,dim] → [B,H,L,dh]
        return t.reshape(B, L, n_heads, dh).transpose(0, 2, 1, 3)

    for i in range(config["n_layers"]):
        p = f"distilbert.transformer.layer.{i}"
        q = heads(_linear(x, w[f"{p}.attention.q_lin.weight"],
                          w[f"{p}.attention.q_lin.bias"])) / np.sqrt(dh)
        k = heads(_linear(x, w[f"{p}.attention.k_lin.weight"],
                          w[f"{p}.attention.k_lin.bias"]))
        v = heads(_linear(x, w[f"{p}.attention.v_lin.weight"],
                          w[f"{p}.attention.v_lin.bias"]))
        scores = q @ k.transpose(0, 1, 3, 2) + neg  # [B,H,L,L]
        ctx = softmax(scores) @ v  # [B,H,L,dh]
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, dim)
        attn_out = _linear(ctx, w[f"{p}.attention.out_lin.weight"],
                           w[f"{p}.attention.out_lin.bias"])
        x = layer_norm(x + attn_out, w[f"{p}.sa_layer_norm.weight"],
                       w[f"{p}.sa_layer_norm.bias"])
        h = gelu(_linear(x, w[f"{p}.ffn.lin1.weight"], w[f"{p}.ffn.lin1.bias"]))
        ffn_out = _linear(h, w[f"{p}.ffn.lin2.weight"], w[f"{p}.ffn.lin2.bias"])
        x = layer_norm(x + ffn_out, w[f"{p}.output_layer_norm.weight"],
                       w[f"{p}.output_layer_norm.bias"])

    x = gelu(_linear(x, w["vocab_transform.weight"], w["vocab_transform.bias"]))
    x = layer_norm(x, w["vocab_layer_norm.weight"], w["vocab_layer_norm.bias"])
    return _linear(x, w["vocab_projector.weight"], w["vocab_projector.bias"])


def bert_forward(
    weights: dict[str, np.ndarray],
    config: dict,
    input_ids: np.ndarray,
    attention_mask: np.ndarray,
) -> np.ndarray:
    """BERT-architecture MLM forward ([B, L] → [B, L, vocab] float64)
    with the checkpoint's own weight names (``bert.encoder.layer.{i}.
    attention.self.query`` …, ``cls.predictions.*`` head). Same
    post-LayerNorm residual math as DistilBERT plus token-type
    embeddings (all-zeros segment for single-sentence MLM scoring, the
    only mode this engine uses) and a decoder that defaults to the
    TIED word-embedding matrix when the export omits
    ``cls.predictions.decoder.weight``. Covers bert-base-cased /
    bert-large-cased — two more of the reference's five golden
    models — given only exported weight files."""
    w = weights
    ids = np.asarray(input_ids, dtype=np.int64)
    mask = np.asarray(attention_mask, dtype=np.float64)
    B, L = ids.shape
    dim, n_heads = config["dim"], config["n_heads"]
    dh = dim // n_heads

    emb = (
        w["bert.embeddings.word_embeddings.weight"][ids]
        + w["bert.embeddings.position_embeddings.weight"][:L][None, :, :]
        + w["bert.embeddings.token_type_embeddings.weight"][0][None, None, :]
    )
    x = layer_norm(
        emb,
        w["bert.embeddings.LayerNorm.weight"],
        w["bert.embeddings.LayerNorm.bias"],
    )
    neg = -1e30 * (1.0 - mask)[:, None, None, :]

    def heads(t):
        return t.reshape(B, L, n_heads, dh).transpose(0, 2, 1, 3)

    for i in range(config["n_layers"]):
        p = f"bert.encoder.layer.{i}"
        q = heads(_linear(x, w[f"{p}.attention.self.query.weight"],
                          w[f"{p}.attention.self.query.bias"])) / np.sqrt(dh)
        k = heads(_linear(x, w[f"{p}.attention.self.key.weight"],
                          w[f"{p}.attention.self.key.bias"]))
        v = heads(_linear(x, w[f"{p}.attention.self.value.weight"],
                          w[f"{p}.attention.self.value.bias"]))
        scores = q @ k.transpose(0, 1, 3, 2) + neg
        ctx = softmax(scores) @ v
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, dim)
        attn_out = _linear(ctx, w[f"{p}.attention.output.dense.weight"],
                           w[f"{p}.attention.output.dense.bias"])
        x = layer_norm(x + attn_out,
                       w[f"{p}.attention.output.LayerNorm.weight"],
                       w[f"{p}.attention.output.LayerNorm.bias"])
        h = gelu(_linear(x, w[f"{p}.intermediate.dense.weight"],
                         w[f"{p}.intermediate.dense.bias"]))
        ffn_out = _linear(h, w[f"{p}.output.dense.weight"],
                          w[f"{p}.output.dense.bias"])
        x = layer_norm(x + ffn_out, w[f"{p}.output.LayerNorm.weight"],
                       w[f"{p}.output.LayerNorm.bias"])

    x = gelu(_linear(x, w["cls.predictions.transform.dense.weight"],
                     w["cls.predictions.transform.dense.bias"]))
    x = layer_norm(x, w["cls.predictions.transform.LayerNorm.weight"],
                   w["cls.predictions.transform.LayerNorm.bias"])
    dec = w.get("cls.predictions.decoder.weight",
                w["bert.embeddings.word_embeddings.weight"])
    bias = w.get("cls.predictions.bias",
                 w.get("cls.predictions.decoder.bias",
                       np.zeros(dec.shape[0])))
    return x @ dec.T + bias


def roberta_forward(
    weights: dict[str, np.ndarray],
    config: dict,
    input_ids: np.ndarray,
    attention_mask: np.ndarray,
) -> np.ndarray:
    """RoBERTa MLM forward — BERT's encoder with two documented
    differences: learned positions start at ``padding_idx + 1 = 2``
    (HF's create_position_ids_from_input_ids for left-packed unpadded
    rows reduces to ``arange(L) + 2``; padded tail rows are garbage as
    everywhere else), and the head is ``lm_head.dense`` → GELU →
    ``lm_head.layer_norm`` → tied/explicit ``lm_head.decoder`` +
    ``lm_head.bias``. Covers roberta-base and roberta-large — the
    reference paper's headline model — from exported weight files."""
    w = weights
    ids = np.asarray(input_ids, dtype=np.int64)
    mask = np.asarray(attention_mask, dtype=np.float64)
    B, L = ids.shape
    dim, n_heads = config["dim"], config["n_heads"]
    dh = dim // n_heads

    emb = (
        w["roberta.embeddings.word_embeddings.weight"][ids]
        + w["roberta.embeddings.position_embeddings.weight"][2: L + 2][None, :, :]
        + w["roberta.embeddings.token_type_embeddings.weight"][0][None, None, :]
    )
    x = layer_norm(
        emb,
        w["roberta.embeddings.LayerNorm.weight"],
        w["roberta.embeddings.LayerNorm.bias"],
    )
    neg = -1e30 * (1.0 - mask)[:, None, None, :]

    def heads(t):
        return t.reshape(B, L, n_heads, dh).transpose(0, 2, 1, 3)

    for i in range(config["n_layers"]):
        p = f"roberta.encoder.layer.{i}"
        q = heads(_linear(x, w[f"{p}.attention.self.query.weight"],
                          w[f"{p}.attention.self.query.bias"])) / np.sqrt(dh)
        k = heads(_linear(x, w[f"{p}.attention.self.key.weight"],
                          w[f"{p}.attention.self.key.bias"]))
        v = heads(_linear(x, w[f"{p}.attention.self.value.weight"],
                          w[f"{p}.attention.self.value.bias"]))
        scores = q @ k.transpose(0, 1, 3, 2) + neg
        ctx = softmax(scores) @ v
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, dim)
        attn_out = _linear(ctx, w[f"{p}.attention.output.dense.weight"],
                           w[f"{p}.attention.output.dense.bias"])
        x = layer_norm(x + attn_out,
                       w[f"{p}.attention.output.LayerNorm.weight"],
                       w[f"{p}.attention.output.LayerNorm.bias"])
        h = gelu(_linear(x, w[f"{p}.intermediate.dense.weight"],
                         w[f"{p}.intermediate.dense.bias"]))
        ffn_out = _linear(h, w[f"{p}.output.dense.weight"],
                          w[f"{p}.output.dense.bias"])
        x = layer_norm(x + ffn_out, w[f"{p}.output.LayerNorm.weight"],
                       w[f"{p}.output.LayerNorm.bias"])

    x = gelu(_linear(x, w["lm_head.dense.weight"], w["lm_head.dense.bias"]))
    x = layer_norm(x, w["lm_head.layer_norm.weight"], w["lm_head.layer_norm.bias"])
    dec = w.get("lm_head.decoder.weight",
                w["roberta.embeddings.word_embeddings.weight"])
    bias = w.get("lm_head.bias",
                 w.get("lm_head.decoder.bias", np.zeros(dec.shape[0])))
    return x @ dec.T + bias


# config.json key aliases: DistilBERT uses the left names natively;
# BERT/RoBERTa configs use the right ones
_CONFIG_ALIASES = {
    "dim": "hidden_size",
    "n_layers": "num_hidden_layers",
    "n_heads": "num_attention_heads",
    "hidden_dim": "intermediate_size",
}


def normalize_config(config: dict) -> dict:
    out = dict(config)
    for k, alias in _CONFIG_ALIASES.items():
        if k not in out and alias in out:
            out[k] = out[alias]
    return out


def detect_forward(weights: dict[str, np.ndarray]):
    """Pick the architecture by the checkpoint's own weight names."""
    for key in weights:
        if key.startswith("distilbert."):
            return distilbert_forward
        if key.startswith("roberta."):
            return roberta_forward
        if key.startswith("bert."):
            return bert_forward
    raise ValueError(
        "unrecognized checkpoint: expected distilbert.*, bert.* or "
        f"roberta.* weight names, got e.g. {sorted(weights)[:3]}"
    )


# ---------------------------------------------------------------------------
# Real-vocab WordPiece tokenizer (BertTokenizer semantics, no deps)
# ---------------------------------------------------------------------------

def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F
    )


class RealWordPieceTokenizer:
    """``vocab.txt``-driven BertTokenizer twin: clean → (optional
    lowercase + accent strip) → punctuation/CJK split → greedy
    longest-match WordPiece with ``##`` continuations and a 100-char
    word cap. Special tokens ([MASK] etc.) are never split."""

    def __init__(self, vocab_path: str, do_lower_case: bool = False):
        self._id_to_token: list[str] = []
        self._token_to_id: dict[str, int] = {}
        with open(vocab_path, encoding="utf-8") as f:
            for line in f:
                tok = line.rstrip("\n")
                self._token_to_id.setdefault(tok, len(self._id_to_token))
                self._id_to_token.append(tok)
        self.vocab_size = len(self._id_to_token)
        self.do_lower_case = do_lower_case
        self.mask_token = "[MASK]"
        self.unk_token = "[UNK]"
        self.mask_token_id = self._token_to_id["[MASK]"]
        self.pad_token_id = self._token_to_id["[PAD]"]
        self.cls_token_id = self._token_to_id["[CLS]"]
        self.sep_token_id = self._token_to_id["[SEP]"]
        self.unk_token_id = self._token_to_id["[UNK]"]
        self.all_special_ids = [
            self.pad_token_id, self.unk_token_id, self.cls_token_id,
            self.sep_token_id, self.mask_token_id,
        ]
        self._special_texts = ("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]")
        import re

        self._special_pat = re.compile(
            "(" + "|".join(re.escape(s) for s in self._special_texts) + ")"
        )

    # -- basic tokenization ------------------------------------------------

    def _clean(self, text: str) -> str:
        out = []
        for ch in text:
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD or _is_control(ch):
                continue
            out.append(" " if ch.isspace() else ch)
        return "".join(out)

    def _basic(self, text: str) -> list[str]:
        text = self._clean(text)
        text = "".join(
            f" {ch} " if _is_cjk(ord(ch)) else ch for ch in text
        )
        tokens: list[str] = []
        for word in text.split():
            if self.do_lower_case:
                word = word.lower()
                word = "".join(
                    c for c in unicodedata.normalize("NFD", word)
                    if unicodedata.category(c) != "Mn"
                )
            cur = ""
            for ch in word:
                if _is_punctuation(ch):
                    if cur:
                        tokens.append(cur)
                    tokens.append(ch)
                    cur = ""
                else:
                    cur += ch
            if cur:
                tokens.append(cur)
        return tokens

    def _wordpiece(self, word: str) -> list[str]:
        if len(word) > 100:
            return [self.unk_token]
        pieces: list[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while end > start:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self._token_to_id:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.unk_token]
            pieces.append(cur)
            start = end
        return pieces

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        ids: list[int] = []
        for part in self._special_pat.split(text):
            if not part:
                continue
            if part in self._special_texts:
                ids.append(self._token_to_id[part])
                continue
            for w in self._basic(part):
                ids.extend(self._token_to_id[p] for p in self._wordpiece(w))
        if add_special_tokens:
            return [self.cls_token_id] + ids + [self.sep_token_id]
        return ids

    def decode(self, ids) -> str:
        if isinstance(ids, (int, np.integer)):
            ids = [int(ids)]
        toks = []
        for i in ids:
            i = int(i)
            if i in (self.cls_token_id, self.sep_token_id, self.pad_token_id):
                continue
            toks.append(self._id_to_token[i] if 0 <= i < self.vocab_size
                        else self.unk_token)
        return " ".join(toks).replace(" ##", "").strip()


# ---------------------------------------------------------------------------
# backend
# ---------------------------------------------------------------------------

class NumpyMaskedLM(HFMaskedLM):
    """HFMaskedLM with the torch forward replaced by
    :func:`distilbert_forward` — every OTHER method (PLL row plans,
    packed batching, beam decode hooks, banned-id scan) is the real
    HF-backend code, so executing this class executes the whole
    previously-dark surface except torch itself."""

    def __init__(self, model_dir: str | None = None, *,
                 weights: dict[str, np.ndarray] | None = None,
                 config: dict | None = None,
                 tokenizer=None, num_threads: int = 1):
        if model_dir is not None:
            weights = load_file(os.path.join(model_dir, "model.safetensors"))
            with open(os.path.join(model_dir, "config.json")) as f:
                config = json.load(f)
            tokenizer = load_checkpoint_tokenizer(model_dir)
        if weights is None or config is None or tokenizer is None:
            raise ValueError("need model_dir or (weights, config, tokenizer)")
        config = normalize_config(config)
        missing = [k for k in REQUIRED_CONFIG if k not in config]
        if missing:
            raise ValueError(f"config missing {missing}")
        if tokenizer.vocab_size != config["vocab_size"]:
            raise ValueError(
                f"vocab.txt has {tokenizer.vocab_size} tokens but config "
                f"says {config['vocab_size']}"
            )
        self._weights = {k: np.asarray(v, dtype=np.float64)
                         for k, v in weights.items()}
        self._forward = detect_forward(self._weights)
        self._config = {k: config[k] for k in REQUIRED_CONFIG}
        self._tok = tokenizer
        self.mask_token = tokenizer.mask_token
        # ban by DECODED text, exactly like the HF backend (reference
        # language_model_wrapper.py:23-27): for byte-BPE a piece like
        # "Ġthe" decodes to " the", which .strip() then matches
        banned = set(tokenizer.all_special_ids)
        for idx in range(tokenizer.vocab_size):
            if tokenizer.decode(idx).lower().strip() in STOPWORD_SET:
                banned.add(idx)
        self._banned = np.array(sorted(banned), dtype=np.int64)

    def _forward_logits_padded(self, ids_list: Sequence[Sequence[int]]) -> np.ndarray:
        maxlen = max(len(ids) for ids in ids_list)
        pad = self._tok.pad_token_id
        input_ids = np.full((len(ids_list), maxlen), pad, dtype=np.int64)
        attn = np.zeros((len(ids_list), maxlen), dtype=np.int64)
        for j, ids in enumerate(ids_list):
            input_ids[j, : len(ids)] = list(ids)
            attn[j, : len(ids)] = 1
        return self._forward(self._weights, self._config, input_ids, attn)


def load_checkpoint_tokenizer(model_dir: str):
    """Tokenizer-only load of a checkpoint dir (driver-side mask
    payloads must never pull the weights into the driver).
    vocab.json + merges.txt → byte-level BPE (RoBERTa family);
    vocab.txt → WordPiece (BERT/DistilBERT family)."""
    from .byte_bpe import RealByteBPETokenizer, has_bpe_artifacts

    if has_bpe_artifacts(model_dir):
        return RealByteBPETokenizer(
            os.path.join(model_dir, "vocab.json"),
            os.path.join(model_dir, "merges.txt"),
        )
    lower = False
    for fname, key in (("tokenizer_config.json", "do_lower_case"),
                       ("config.json", "do_lower_case")):
        fpath = os.path.join(model_dir, fname)
        if os.path.exists(fpath):
            with open(fpath) as f:
                val = json.load(f).get(key)
            if val is not None:
                lower = bool(val)
                break
    return RealWordPieceTokenizer(
        os.path.join(model_dir, "vocab.txt"), do_lower_case=lower
    )


_NUMPY_CACHE: dict[str, NumpyMaskedLM] = {}


def get_cached_numpy_lm(model_dir: str) -> NumpyMaskedLM:
    """One checkpoint per python worker process (the mapInPandas
    executor-singleton pattern, same as get_cached_hf_lm)."""
    if model_dir not in _NUMPY_CACHE:
        _NUMPY_CACHE[model_dir] = NumpyMaskedLM(model_dir)
    return _NUMPY_CACHE[model_dir]


def tokenizer_token_masks_from_vocab(tok):
    """(vocab_size, char_ok_mask, banned_ids) from a checkpoint-backed
    tokenizer (WordPiece or byte-BPE) — the no-transformers twin of
    hf.tokenizer_token_masks, for the driver-side beam mask payload.
    Scans DECODED texts, like the HF backend."""
    from ..functions.textops import token_text_allowed

    vocab = tok.vocab_size
    char_ok = np.zeros(vocab, dtype=bool)
    banned = set(tok.all_special_ids)
    for idx in range(vocab):
        text = tok.decode(idx)
        char_ok[idx] = token_text_allowed(text)
        if text.lower().strip() in STOPWORD_SET:
            banned.add(idx)
    return vocab, char_ok, np.array(sorted(banned), dtype=np.int64)
