"""The pure-numpy DistilBERT backend (lm/numpy_lm.py): erf pinned to
math.erf, safetensors round trip, the vectorized forward pinned to an
INDEPENDENT loop-based implementation, padding invariance, and the
full HFMaskedLM surface (PLL batch==loop, beam end-to-end) over a tiny
random-weight checkpoint written to disk — executing every line of the
previously torch-dark forward path with real transformer math."""

import json
import math
import os

import numpy as np
import pytest

from knowledge_harvest_from_lms_spark.lm.numpy_lm import (
    NumpyMaskedLM,
    RealWordPieceTokenizer,
    distilbert_forward,
    erf,
    gelu,
    layer_norm,
    load_checkpoint_tokenizer,
    softmax,
    tokenizer_token_masks_from_vocab,
)
from knowledge_harvest_from_lms_spark.lm.safetensors_io import load_file, save_file

# ---------------------------------------------------------------------------
# tiny checkpoint
# ---------------------------------------------------------------------------

CFG = {
    "dim": 8, "n_layers": 2, "n_heads": 2, "hidden_dim": 16,
    "max_position_embeddings": 64,
}

WORDS = [
    "giraffe", "africa", "lion", "savanna", "kitchen", "table", "you",
    "find", "located", "lives", "in", "is", "the", "a", "can", "at",
    "##s", "##e", "##d", "##ing",
]


def _vocab_lines():
    lines = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    for c in "abcdefghijklmnopqrstuvwxyz0123456789":
        lines.append(c)
        lines.append("##" + c)
    for c in ".,!?'\"-()":
        lines.append(c)
    lines.extend(WORDS)
    return lines


def _tiny_weights(vocab: int, seed: int = 7) -> dict:
    rng = np.random.Generator(np.random.PCG64(seed))
    d, h = CFG["dim"], CFG["hidden_dim"]

    def r(*shape):
        return (rng.standard_normal(shape) * 0.5).astype(np.float32)

    w = {
        "distilbert.embeddings.word_embeddings.weight": r(vocab, d),
        "distilbert.embeddings.position_embeddings.weight":
            r(CFG["max_position_embeddings"], d),
        "distilbert.embeddings.LayerNorm.weight": np.ones(d, np.float32),
        "distilbert.embeddings.LayerNorm.bias": r(d),
        "vocab_transform.weight": r(d, d),
        "vocab_transform.bias": r(d),
        "vocab_layer_norm.weight": np.ones(d, np.float32),
        "vocab_layer_norm.bias": r(d),
        "vocab_projector.weight": r(vocab, d),
        "vocab_projector.bias": r(vocab),
    }
    for i in range(CFG["n_layers"]):
        p = f"distilbert.transformer.layer.{i}"
        w.update({
            f"{p}.attention.q_lin.weight": r(d, d),
            f"{p}.attention.q_lin.bias": r(d),
            f"{p}.attention.k_lin.weight": r(d, d),
            f"{p}.attention.k_lin.bias": r(d),
            f"{p}.attention.v_lin.weight": r(d, d),
            f"{p}.attention.v_lin.bias": r(d),
            f"{p}.attention.out_lin.weight": r(d, d),
            f"{p}.attention.out_lin.bias": r(d),
            f"{p}.sa_layer_norm.weight": np.ones(d, np.float32),
            f"{p}.sa_layer_norm.bias": r(d),
            f"{p}.ffn.lin1.weight": r(h, d),
            f"{p}.ffn.lin1.bias": r(h),
            f"{p}.ffn.lin2.weight": r(d, h),
            f"{p}.ffn.lin2.bias": r(d),
            f"{p}.output_layer_norm.weight": np.ones(d, np.float32),
            f"{p}.output_layer_norm.bias": r(d),
        })
    return w


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    """A real on-disk checkpoint: model.safetensors + vocab.txt +
    config.json — the exact layout a torch machine exports."""
    d = tmp_path_factory.mktemp("tiny_distilbert")
    lines = _vocab_lines()
    (d / "vocab.txt").write_text("\n".join(lines) + "\n")
    cfg = dict(CFG, vocab_size=len(lines), do_lower_case=True)
    (d / "config.json").write_text(json.dumps(cfg))
    save_file(_tiny_weights(len(lines)), str(d / "model.safetensors"),
              metadata={"format": "pt"})
    return str(d)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def test_erf_matches_math_erf():
    xs = np.concatenate([
        np.linspace(-6.5, 6.5, 4001),
        np.array([0.0, 0.46875, -0.46875, 4.0, -4.0, 0.468751, 3.999999,
                  4.000001, 1e-20, -1e-20, 27.0, -27.0]),
        np.random.Generator(np.random.PCG64(1)).standard_normal(2000) * 3,
    ])
    got = erf(xs)
    want = np.array([math.erf(v) for v in xs])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-14)


def test_gelu_and_softmax_shapes():
    x = np.linspace(-4, 4, 101)
    g = gelu(x)
    ref = 0.5 * x * (1 + np.array([math.erf(v / math.sqrt(2)) for v in x]))
    np.testing.assert_allclose(g, ref, atol=1e-14)
    s = softmax(np.random.Generator(np.random.PCG64(2)).standard_normal((3, 7)))
    np.testing.assert_allclose(s.sum(axis=-1), 1.0, atol=1e-12)


def test_safetensors_round_trip(tmp_path):
    tensors = {
        "a.weight": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b.bias": np.linspace(-1, 1, 5).astype(np.float64),
        "c.ids": np.array([[1, 2], [3, 4]], dtype=np.int64),
    }
    p = str(tmp_path / "t.safetensors")
    save_file(tensors, p, metadata={"format": "pt"})
    back = load_file(p)
    assert set(back) == set(tensors)
    for k in tensors:
        assert back[k].dtype == tensors[k].dtype
        np.testing.assert_array_equal(back[k], tensors[k])


# ---------------------------------------------------------------------------
# forward correctness
# ---------------------------------------------------------------------------

def _loop_forward(w, cfg, ids_row):
    """Independent per-position / per-head loop implementation (no
    batching, no einsum/reshape tricks, math.erf) — the forward's
    correctness anchor."""
    d, nh = cfg["dim"], cfg["n_heads"]
    dh = d // nh
    L = len(ids_row)

    def ln(vec, wn, bn):
        mu = sum(vec) / len(vec)
        var = sum((v - mu) ** 2 for v in vec) / len(vec)
        return [(v - mu) / math.sqrt(var + 1e-12) * ww + bb
                for v, ww, bb in zip(vec, wn, bn)]

    def lin(vec, wm, bm):
        return [sum(vec[j] * wm[o][j] for j in range(len(vec))) + bm[o]
                for o in range(len(bm))]

    def g(v):
        return 0.5 * v * (1 + math.erf(v / math.sqrt(2)))

    x = []
    for pos, tid in enumerate(ids_row):
        e = [
            w["distilbert.embeddings.word_embeddings.weight"][tid][j]
            + w["distilbert.embeddings.position_embeddings.weight"][pos][j]
            for j in range(d)
        ]
        x.append(ln(e, w["distilbert.embeddings.LayerNorm.weight"],
                    w["distilbert.embeddings.LayerNorm.bias"]))

    for i in range(cfg["n_layers"]):
        p = f"distilbert.transformer.layer.{i}"
        q = [lin(r, w[f"{p}.attention.q_lin.weight"], w[f"{p}.attention.q_lin.bias"]) for r in x]
        k = [lin(r, w[f"{p}.attention.k_lin.weight"], w[f"{p}.attention.k_lin.bias"]) for r in x]
        v = [lin(r, w[f"{p}.attention.v_lin.weight"], w[f"{p}.attention.v_lin.bias"]) for r in x]
        ctx = [[0.0] * d for _ in range(L)]
        for hd in range(nh):
            lo = hd * dh
            for qi in range(L):
                scores = []
                for ki in range(L):
                    s = sum(q[qi][lo + t] * k[ki][lo + t] for t in range(dh))
                    scores.append(s / math.sqrt(dh))
                mx = max(scores)
                es = [math.exp(s - mx) for s in scores]
                tot = sum(es)
                probs = [e_ / tot for e_ in es]
                for t in range(dh):
                    ctx[qi][lo + t] = sum(
                        probs[ki] * v[ki][lo + t] for ki in range(L)
                    )
        attn_out = [lin(r, w[f"{p}.attention.out_lin.weight"],
                        w[f"{p}.attention.out_lin.bias"]) for r in ctx]
        x = [ln([a + b for a, b in zip(xr, ar)],
                w[f"{p}.sa_layer_norm.weight"], w[f"{p}.sa_layer_norm.bias"])
             for xr, ar in zip(x, attn_out)]
        hid = [[g(v_) for v_ in lin(r, w[f"{p}.ffn.lin1.weight"],
                                    w[f"{p}.ffn.lin1.bias"])] for r in x]
        ffn = [lin(r, w[f"{p}.ffn.lin2.weight"], w[f"{p}.ffn.lin2.bias"])
               for r in hid]
        x = [ln([a + b for a, b in zip(xr, fr)],
                w[f"{p}.output_layer_norm.weight"],
                w[f"{p}.output_layer_norm.bias"])
             for xr, fr in zip(x, ffn)]

    out = []
    for r in x:
        t = [g(v_) for v_ in lin(r, w["vocab_transform.weight"],
                                 w["vocab_transform.bias"])]
        t = ln(t, w["vocab_layer_norm.weight"], w["vocab_layer_norm.bias"])
        out.append(lin(t, w["vocab_projector.weight"], w["vocab_projector.bias"]))
    return np.array(out)


def test_forward_matches_independent_loop_reference():
    vocab = len(_vocab_lines())
    w64 = {k: np.asarray(v, np.float64) for k, v in _tiny_weights(vocab).items()}
    cfg = dict(CFG, vocab_size=vocab)
    ids = np.array([[2, 9, 17, 30, 4, 3]])  # arbitrary in-vocab ids
    mask = np.ones_like(ids)
    fast = distilbert_forward(w64, cfg, ids, mask)
    slow = _loop_forward(w64, cfg, ids[0].tolist())
    np.testing.assert_allclose(fast[0], slow, rtol=1e-9, atol=1e-9)


def test_forward_padding_invariance():
    """Attention-mask correctness: a row's logits at real positions are
    identical whether it is forwarded alone or padded inside a batch
    next to longer rows."""
    vocab = len(_vocab_lines())
    w64 = {k: np.asarray(v, np.float64) for k, v in _tiny_weights(vocab).items()}
    cfg = dict(CFG, vocab_size=vocab)
    a = [2, 9, 17, 3]
    b = [2, 30, 31, 9, 44, 17, 20, 3]
    maxlen = len(b)
    ids = np.zeros((2, maxlen), dtype=np.int64)
    attn = np.zeros((2, maxlen), dtype=np.int64)
    for j, row in enumerate((a, b)):
        ids[j, : len(row)] = row
        attn[j, : len(row)] = 1
    batch = distilbert_forward(w64, cfg, ids, attn)
    solo_a = distilbert_forward(
        w64, cfg, np.array([a]), np.ones((1, len(a)), dtype=np.int64))
    solo_b = distilbert_forward(
        w64, cfg, np.array([b]), np.ones((1, len(b)), dtype=np.int64))
    np.testing.assert_allclose(batch[0, : len(a)], solo_a[0], atol=1e-10)
    np.testing.assert_allclose(batch[1], solo_b[0], atol=1e-10)


def test_layer_norm_basic():
    x = np.array([[1.0, 2.0, 3.0, 4.0]])
    out = layer_norm(x, np.ones(4), np.zeros(4))
    np.testing.assert_allclose(out.mean(), 0.0, atol=1e-12)
    np.testing.assert_allclose(out.std(), 1.0, atol=1e-6)


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

def test_wordpiece_tokenizer_semantics(ckpt_dir):
    tok = load_checkpoint_tokenizer(ckpt_dir)
    assert tok.do_lower_case is True
    # greedy longest match: 'giraffes' = 'giraffe' + '##s'
    ids = tok.encode("giraffes", add_special_tokens=False)
    assert [tok._id_to_token[i] for i in ids] == ["giraffe", "##s"]
    # lowercase mode folds case and strips accents
    assert tok.encode("Giraffe", add_special_tokens=False) == tok.encode(
        "giraffe", add_special_tokens=False)
    assert tok.encode("girafé", add_special_tokens=False) == tok.encode(
        "girafe", add_special_tokens=False)
    # punctuation splits; [MASK] survives intact
    ids = tok.encode("a [MASK], lives.")
    toks = [tok._id_to_token[i] for i in ids]
    assert toks[0] == "[CLS]" and toks[-1] == "[SEP]"
    assert "[MASK]" in toks and "," in toks and "." in toks
    # decode fuses continuations
    assert tok.decode(tok.encode("giraffes lives in africa")) == \
        "giraffes lives in africa"
    # char-level fallback keeps unseen words encodable (no [UNK])
    zz = tok.encode("zq", add_special_tokens=False)
    assert tok.unk_token_id not in zz and len(zz) == 2


def test_token_masks_from_vocab(ckpt_dir):
    tok = load_checkpoint_tokenizer(ckpt_dir)
    vocab, char_ok, banned = tokenizer_token_masks_from_vocab(tok)
    assert vocab == tok.vocab_size
    # stopwords and specials banned; content words not
    the_id = tok.encode("the", add_special_tokens=False)[0]
    giraffe_id = tok.encode("giraffe", add_special_tokens=False)[0]
    assert the_id in banned and giraffe_id not in banned
    for sid in tok.all_special_ids:
        assert sid in banned
    assert char_ok[giraffe_id] and not char_ok[tok.encode(",", add_special_tokens=False)[0]]


# ---------------------------------------------------------------------------
# backend surface
# ---------------------------------------------------------------------------

def test_numpy_backend_pll_batch_equals_loop(ckpt_dir):
    lm = NumpyMaskedLM(ckpt_dir)
    pairs = [
        ("<ENT0> is located in <ENT1> .", ["giraffe", "africa"]),
        ("You can find <ENT0> in <ENT1> .", ["lions", "savanna"]),
    ]
    batch = lm.pll_mask_logprobs_batch(pairs)
    for got, (prompt, ents) in zip(batch, pairs):
        loop = lm.pll_mask_logprobs(prompt, ents)
        np.testing.assert_allclose(got, loop, rtol=1e-12)
        assert all(lp < 0 for lp in got)  # real log-softmax values


def test_numpy_backend_mask_logits(ckpt_dir):
    lm = NumpyMaskedLM(ckpt_dir)
    outs = lm.mask_logits_batch([
        "the [MASK] is located in [MASK][MASK] .",
        "a [MASK] lives in the savanna .",
    ])
    assert outs[0].shape == (3, lm.vocab_size)
    assert outs[1].shape == (1, lm.vocab_size)
    # deterministic across instances (fresh load from disk)
    lm2 = NumpyMaskedLM(ckpt_dir)
    np.testing.assert_array_equal(
        outs[0], lm2.mask_logits_batch(["the [MASK] is located in [MASK][MASK] ."])[0]
    )


def test_numpy_backend_resolve_and_payload(ckpt_dir):
    from knowledge_harvest_from_lms_spark.lm import (
        resolve_lm,
        token_mask_payload,
        unpack_token_masks,
    )

    name = f"numpy:{ckpt_dir}"
    a, b = resolve_lm(name), resolve_lm(name)
    assert a is b  # per-process singleton
    payload = token_mask_payload(name)
    assert payload is not None
    char_ok, banned = unpack_token_masks(payload)
    assert len(char_ok) == a.vocab_size
    np.testing.assert_array_equal(np.nonzero(banned)[0], a.banned_ids)


def test_numpy_backend_beam_end_to_end(spark, ckpt_dir):
    """The full beam-search operator over the numpy transformer — the
    previously torch-dark forward drives search_ent_tuples through
    mapInPandas on executors."""
    from knowledge_harvest_from_lms_spark.config import HarvestConfig
    from knowledge_harvest_from_lms_spark.functions.textops import (
        entity_passes_filters,
    )
    from knowledge_harvest_from_lms_spark.operators.beam_search import (
        finalize_candidates,
        search_ent_tuples,
    )
    from knowledge_harvest_from_lms_spark.sources.relations import (
        fixture_relations,
    )

    cfg = HarvestConfig(
        max_n_ent_tuples=6, token_beam_width=5, max_ent_subwords=2,
        shuffle_partitions=4, lm=f"numpy:{ckpt_dir}", prune_slack=None,
    )
    pw = spark.createDataFrame(
        [("AtLocation", "<ENT0> is located in <ENT1> .", 0.6),
         ("AtLocation", "You find <ENT0> in <ENT1> .", 0.4)],
        "rel string, prompt string, weight double",
    )
    rels = fixture_relations(spark).filter("rel = 'AtLocation'")
    raw = search_ent_tuples(spark, pw, rels, cfg)
    cand = finalize_candidates(raw, cfg).collect()
    assert cand, "beam over the numpy transformer must complete tuples"
    for r in cand:
        assert len(r.ents) == 2
        for e in r.ents:
            assert entity_passes_filters(e), e


def test_synth_checkpoint_writer_loads_and_scores(tmp_path):
    """The package-level synthetic-checkpoint writer (used by
    bench_scaling's real-math PLL workload) produces a directory the
    numpy backend loads through the same path as a real export;
    writes are byte-deterministic for a given spec."""
    from knowledge_harvest_from_lms_spark.lm.synth_checkpoint import (
        write_synth_checkpoint,
    )

    d1 = write_synth_checkpoint(str(tmp_path / "a"), vocab_words=("zebra",))
    d2 = write_synth_checkpoint(str(tmp_path / "b"), vocab_words=("zebra",))
    for fname in ("model.safetensors", "vocab.txt", "config.json"):
        assert (
            open(os.path.join(d1, fname), "rb").read()
            == open(os.path.join(d2, fname), "rb").read()
        ), fname
    lm = NumpyMaskedLM(d1)
    lps = lm.pll_mask_logprobs("<ENT0> is located in <ENT1> .",
                               ["zebra", "africa"])
    assert len(lps) == 2 and all(lp < 0 for lp in lps)


def _bert_weights_from_distil(w, vocab):
    """Name-map the tiny distilbert weights into the BERT layout with
    zero token-type embeddings — numerically the same network."""
    d = CFG["dim"]
    out = {
        "bert.embeddings.word_embeddings.weight":
            w["distilbert.embeddings.word_embeddings.weight"],
        "bert.embeddings.position_embeddings.weight":
            w["distilbert.embeddings.position_embeddings.weight"],
        "bert.embeddings.token_type_embeddings.weight":
            np.zeros((2, d), np.float32),
        "bert.embeddings.LayerNorm.weight":
            w["distilbert.embeddings.LayerNorm.weight"],
        "bert.embeddings.LayerNorm.bias":
            w["distilbert.embeddings.LayerNorm.bias"],
        "cls.predictions.transform.dense.weight": w["vocab_transform.weight"],
        "cls.predictions.transform.dense.bias": w["vocab_transform.bias"],
        "cls.predictions.transform.LayerNorm.weight": w["vocab_layer_norm.weight"],
        "cls.predictions.transform.LayerNorm.bias": w["vocab_layer_norm.bias"],
        "cls.predictions.decoder.weight": w["vocab_projector.weight"],
        "cls.predictions.bias": w["vocab_projector.bias"],
    }
    name_map = {
        "attention.q_lin": "attention.self.query",
        "attention.k_lin": "attention.self.key",
        "attention.v_lin": "attention.self.value",
        "attention.out_lin": "attention.output.dense",
        "sa_layer_norm": "attention.output.LayerNorm",
        "ffn.lin1": "intermediate.dense",
        "ffn.lin2": "output.dense",
        "output_layer_norm": "output.LayerNorm",
    }
    for i in range(CFG["n_layers"]):
        for old, new in name_map.items():
            for part in ("weight", "bias"):
                out[f"bert.encoder.layer.{i}.{new}.{part}"] = \
                    w[f"distilbert.transformer.layer.{i}.{old}.{part}"]
    return out


def test_bert_forward_equals_distilbert_on_mapped_weights(tmp_path):
    """bert_forward (BERT weight names, token types, tied-decoder
    head) is the same network as distilbert_forward when the weights
    are name-mapped — pins the BERT architecture path to the already
    loop-verified DistilBERT one, and exercises the BERT-style
    config.json aliases (hidden_size / num_hidden_layers / ...)."""
    from knowledge_harvest_from_lms_spark.lm.numpy_lm import bert_forward

    vocab = len(_vocab_lines())
    dw = {k: np.asarray(v, np.float64) for k, v in _tiny_weights(vocab).items()}
    bw = {k: np.asarray(v, np.float64)
          for k, v in _bert_weights_from_distil(dw, vocab).items()}
    cfg = dict(CFG, vocab_size=vocab)
    ids = np.array([[2, 9, 17, 30, 4, 3], [2, 40, 11, 0, 0, 0]])
    attn = np.array([[1, 1, 1, 1, 1, 1], [1, 1, 1, 0, 0, 0]])
    np.testing.assert_allclose(
        bert_forward(bw, cfg, ids, attn),
        distilbert_forward(dw, cfg, ids, attn),
        atol=1e-12,
    )
    # tied-decoder fallback: drop the explicit decoder -> logits use
    # the word-embedding matrix instead
    bw2 = dict(bw)
    del bw2["cls.predictions.decoder.weight"]
    tied = bert_forward(bw2, cfg, ids, attn)
    assert tied.shape == (2, 6, vocab)

    # full backend load from a BERT-layout checkpoint dir with
    # BERT-style config keys
    d = tmp_path / "tiny_bert"
    d.mkdir()
    lines = _vocab_lines()
    (d / "vocab.txt").write_text("\n".join(lines) + "\n")
    (d / "config.json").write_text(json.dumps({
        "architectures": ["BertForMaskedLM"],
        "hidden_size": CFG["dim"],
        "num_hidden_layers": CFG["n_layers"],
        "num_attention_heads": CFG["n_heads"],
        "intermediate_size": CFG["hidden_dim"],
        "max_position_embeddings": CFG["max_position_embeddings"],
        "vocab_size": vocab,
        "do_lower_case": True,
    }))
    save_file({k: np.asarray(v, np.float32) for k, v in bw.items()},
              str(d / "model.safetensors"))
    lm = NumpyMaskedLM(str(d))
    lps = lm.pll_mask_logprobs("<ENT0> is located in <ENT1> .",
                               ["giraffe", "africa"])
    assert len(lps) == 2 and all(lp < 0 for lp in lps)


# ---------------------------------------------------------------------------
# RoBERTa family (byte-BPE tokenizer + roberta forward)
# ---------------------------------------------------------------------------

def _bpe_ckpt(tmp_path):
    """Tiny REAL-format RoBERTa checkpoint: vocab.json with the full
    byte alphabet + a few merged pieces, merges.txt with their ranks,
    and roberta-named weights mapped from the distilbert tinies (pos
    embeddings shifted by the +2 RoBERTa offset so outputs are
    comparable)."""
    from knowledge_harvest_from_lms_spark.lm.byte_bpe import bytes_to_unicode

    d = tmp_path / "tiny_roberta"
    d.mkdir()
    b2u = bytes_to_unicode()
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for ch in sorted(set(b2u.values())):
        vocab[ch] = len(vocab)
    for piece in ("ir", "ira", "Ġg"):
        vocab[piece] = len(vocab)
    vocab["<mask>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\ni r\nir a\nĠ g\n")

    V = len(vocab)
    dw = _tiny_weights(V)
    pos = dw["distilbert.embeddings.position_embeddings.weight"]
    shifted = np.zeros_like(pos)
    shifted[2:] = pos[:-2]
    w = {
        "roberta.embeddings.word_embeddings.weight":
            dw["distilbert.embeddings.word_embeddings.weight"],
        "roberta.embeddings.position_embeddings.weight": shifted,
        "roberta.embeddings.token_type_embeddings.weight":
            np.zeros((1, CFG["dim"]), np.float32),
        "roberta.embeddings.LayerNorm.weight":
            dw["distilbert.embeddings.LayerNorm.weight"],
        "roberta.embeddings.LayerNorm.bias":
            dw["distilbert.embeddings.LayerNorm.bias"],
        "lm_head.dense.weight": dw["vocab_transform.weight"],
        "lm_head.dense.bias": dw["vocab_transform.bias"],
        "lm_head.layer_norm.weight": dw["vocab_layer_norm.weight"],
        "lm_head.layer_norm.bias": dw["vocab_layer_norm.bias"],
        "lm_head.decoder.weight": dw["vocab_projector.weight"],
        "lm_head.bias": dw["vocab_projector.bias"],
    }
    name_map = {
        "attention.q_lin": "attention.self.query",
        "attention.k_lin": "attention.self.key",
        "attention.v_lin": "attention.self.value",
        "attention.out_lin": "attention.output.dense",
        "sa_layer_norm": "attention.output.LayerNorm",
        "ffn.lin1": "intermediate.dense",
        "ffn.lin2": "output.dense",
        "output_layer_norm": "output.LayerNorm",
    }
    for i in range(CFG["n_layers"]):
        for old, new in name_map.items():
            for part in ("weight", "bias"):
                w[f"roberta.encoder.layer.{i}.{new}.{part}"] = \
                    dw[f"distilbert.transformer.layer.{i}.{old}.{part}"]
    save_file(w, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "architectures": ["RobertaForMaskedLM"],
        "hidden_size": CFG["dim"],
        "num_hidden_layers": CFG["n_layers"],
        "num_attention_heads": CFG["n_heads"],
        "intermediate_size": CFG["hidden_dim"],
        "max_position_embeddings": CFG["max_position_embeddings"],
        "vocab_size": V,
    }))
    return str(d), dw, V


def test_byte_bpe_tokenizer_semantics(tmp_path):
    from knowledge_harvest_from_lms_spark.lm.numpy_lm import (
        load_checkpoint_tokenizer,
    )

    d, _, _ = _bpe_ckpt(tmp_path)
    tok = load_checkpoint_tokenizer(d)  # dispatches on vocab.json+merges
    # merges apply lowest-rank-first; Ġ marks the word boundary
    ids = tok.encode("a giraffe", add_special_tokens=False)
    pieces = [tok._id_to_piece[i] for i in ids]
    assert pieces == ["a", "Ġg", "ira", "f", "f", "e"]
    # round trip through the byte map
    assert tok.decode(tok.encode("a giraffe")) == "a giraffe"
    # specials: <s>/</s> wrap, <mask> swallows its conventional space
    full = tok.encode("a <mask> .")
    assert full[0] == tok.bos_token_id and full[-1] == tok.eos_token_id
    assert tok.mask_token_id in full
    # unicode text survives the byte alphabet
    assert tok.decode(tok.encode("café", add_special_tokens=False)) == "café"
    # underscores are NOT dropped: '_' is in \w but not \p{L}/\p{N},
    # so the punctuation branch must claim it (GPT-2's real pattern
    # treats '_' as punctuation) — regression for the r4 ADVICE bug
    # where 'foo_bar' encoded as ['foo','bar']
    assert tok.decode(tok.encode("foo_bar", add_special_tokens=False)) \
        == "foo_bar"
    us_pieces = [tok._id_to_piece[i]
                 for i in tok.encode("a_b", add_special_tokens=False)]
    assert "_" in "".join(us_pieces)
    assert tok.decode(tok.encode("a _. b", add_special_tokens=False)) \
        == "a _. b"
    # single-token decode of a Ġ piece gives the leading space the
    # banned-scan strips (HF behavior)
    gid = tok.encode(" giraffe", add_special_tokens=False)[0]
    assert tok.decode(gid).startswith(" ")


def test_roberta_forward_equals_distilbert_on_mapped_weights(tmp_path):
    """roberta_forward (position offset +2, lm_head names, token
    types) is the same network as the loop-verified distilbert_forward
    when weights are name-mapped and positions pre-shifted."""
    from knowledge_harvest_from_lms_spark.lm.numpy_lm import roberta_forward

    d, dw, V = _bpe_ckpt(tmp_path)
    from knowledge_harvest_from_lms_spark.lm.safetensors_io import load_file

    rw = {k: np.asarray(v, np.float64)
          for k, v in load_file(os.path.join(d, "model.safetensors")).items()}
    dw64 = {k: np.asarray(v, np.float64) for k, v in dw.items()}
    cfg = dict(CFG, vocab_size=V)
    ids = np.array([[0, 9, 17, 30, 4, 2], [0, 40, 11, 1, 1, 1]])
    attn = np.array([[1, 1, 1, 1, 1, 1], [1, 1, 1, 0, 0, 0]])
    np.testing.assert_allclose(
        roberta_forward(rw, cfg, ids, attn),
        distilbert_forward(dw64, cfg, ids, attn),
        atol=1e-12,
    )


def test_roberta_backend_end_to_end(tmp_path):
    """NumpyMaskedLM over the BPE checkpoint: architecture dispatch,
    decoded-text banned scan (Ġthe → 'the'), PLL batch==loop."""
    d, _, _ = _bpe_ckpt(tmp_path)
    lm = NumpyMaskedLM(d)
    tok = lm._tok
    # 'a' is a stopword reachable as the single-token piece "a"
    a_id = tok.encode("a", add_special_tokens=False)[0]
    assert a_id in lm.banned_ids
    pairs = [("<ENT0> is located in <ENT1> .", ["giraffe", "africa"])]
    batch = lm.pll_mask_logprobs_batch(pairs)
    loop = lm.pll_mask_logprobs(*pairs[0])
    np.testing.assert_allclose(batch[0], loop, rtol=1e-12)
    assert all(lp < 0 for lp in loop)
