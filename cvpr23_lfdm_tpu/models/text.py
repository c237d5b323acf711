"""Text conditioning: BERT class-text embeddings.

Reference: DM/modules/text.py — a frozen `bert-base-cased` whose masked
token-mean (excluding [CLS]) yields a 768-d embedding; in the reference it
is only ever fed the fixed class-name vocabulary of each dataset
(DM/datasets_{mug,mhad,natops}.py). TPU-native strategy (SURVEY.md §7.7):
precompute the <40 class embeddings once on host with HF transformers and
cache them; the serving/training path is then a pure table lookup with no
torch/HF dependency. A pluggable `encode_texts` remains for free text.

Class lists are transcribed verbatim from the reference datasets
(datasets_mug.py:26, datasets_mhad.py:25-51, datasets_natops.py:30-53).
"""

from __future__ import annotations

import os

import numpy as np

BERT_MODEL_DIM = 768
NULL_TEXT = "None"  # forced-null conditioning token (video_flow_diffusion.py:863)

MUG_CLASSES = (
    "anger", "disgust", "fear", "happiness", "neutral", "sadness", "surprise",
)

MHAD_CLASSES = (
    "right arm swipe to the left",
    "right arm swipe to the right",
    "right hand wave",
    "two hand front clap",
    "right arm throw",
    "cross arms in the chest",
    "basketball shooting",
    "draw x",
    "draw circle clockwise",
    "draw circle counter clockwise",
    "draw triangle",
    "right hand bowling",
    "front boxing",
    "baseball swing from right",
    "tennis forehand swing",
    "two arms curl",
    "tennis serve",
    "two hand push",
    "knock on door",
    "hand catch",
    "pick up and throw",
    "jogging",
    "walking",
    "sit to stand",
    "stand to sit",
    "forward lunge (left foot forward)",
    "squat",
)

NATOPS_CLASSES = (
    "I Have Command",
    "All Clear",
    "Not Clear",
    "Spread Wings",
    "Fold Wings",
    "Lock Wings",
    "Up Hook",
    "Down Hook",
    "Remove Tiedowns",
    "Remove Chocks",
    "Insert Chocks",
    "Move Ahead",
    "Turn Left",
    "Turn Right",
    "Next Marshaller",
    "Slow Down",
    "Stop",
    "Nosegear Steering",
    "Hot Brakes",
    "Brakes On",
    "Brakes Off",
    "Install Tiedowns",
    "Fire",
    "Cut Engine",
)

DATASET_CLASSES = {"mug": MUG_CLASSES, "mhad": MHAD_CLASSES, "natops": NATOPS_CLASSES}

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "assets")


def bert_masked_mean_embed(
    texts: list[str], model_name_or_path: str = "bert-base-cased"
) -> np.ndarray:
    """Reference `bert_embed(tokenize(texts))` semantics (DM/modules/text.py:56-89):
    final hidden states, masked mean over tokens excluding [CLS], eps 1e-8.

    Host-side, torch CPU; used only to (re)build embedding caches.
    `model_name_or_path` may be a local HF checkpoint dir (weight drop).
    """
    import torch
    from transformers import AutoModel, AutoTokenizer

    # local-first: hub-name resolution retries the network for ~2 min in
    # egress-less environments before failing; a local cache/dir loads
    # identically with local_files_only and we only fall through to the
    # network when nothing is cached.
    try:
        tok = AutoTokenizer.from_pretrained(
            model_name_or_path, local_files_only=True
        )
        model = AutoModel.from_pretrained(
            model_name_or_path, local_files_only=True
        )
    except Exception:
        tok = AutoTokenizer.from_pretrained(model_name_or_path)
        model = AutoModel.from_pretrained(model_name_or_path)
    model.eval()
    enc = tok(list(texts), padding=True, return_tensors="pt")
    with torch.no_grad():
        out = model(
            input_ids=enc.input_ids,
            attention_mask=(enc.input_ids != 0).long(),
            output_hidden_states=True,
        )
    hidden = out.hidden_states[-1]
    mask = (enc.input_ids != 0)[:, 1:, None].float()
    num = (hidden[:, 1:] * mask).sum(1)
    den = mask.sum(1)
    return (num / (den + 1e-8)).numpy().astype(np.float32)


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if (
        33 <= cp <= 47 or 58 <= cp <= 64 or 91 <= cp <= 96 or 123 <= cp <= 126
    ):
        return True
    import unicodedata

    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F
    )


class WordPieceTokenizer:
    """Self-contained BERT tokenizer (basic + WordPiece) over a vocab.txt.

    Implements the `bert-base-cased` pipeline the reference reaches through
    torch.hub (DM/modules/text.py:17-50: batch_encode_plus with special
    tokens + padding) without the transformers dependency — serving needs
    only the vocab file. Parity-tested against transformers.BertTokenizer
    in tests/test_bert.py.
    """

    def __init__(self, vocab_file: str, do_lower_case: bool = False):
        with open(vocab_file, encoding="utf-8") as f:
            tokens = [line.rstrip("\n") for line in f]
        self.vocab = {t: i for i, t in enumerate(tokens)}
        self.do_lower_case = do_lower_case
        self.pad_id = self.vocab["[PAD]"]
        self.cls_id = self.vocab["[CLS]"]
        self.sep_id = self.vocab["[SEP]"]
        self.unk = "[UNK]"

    # --- basic tokenizer (transformers BasicTokenizer semantics) ---

    def _clean(self, text: str) -> str:
        import unicodedata

        out = []
        for ch in text:
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD:
                continue
            cat = unicodedata.category(ch)
            if cat in ("Cc", "Cf") and ch not in "\t\n\r":
                continue
            if ch in "\t\n\r" or cat == "Zs":
                out.append(" ")
            elif _is_cjk(cp):
                out.append(f" {ch} ")
            else:
                out.append(ch)
        return "".join(out)

    def _split_punct(self, word: str) -> list[str]:
        pieces, cur = [], []
        for ch in word:
            if _is_punct(ch):
                if cur:
                    pieces.append("".join(cur))
                    cur = []
                pieces.append(ch)
            else:
                cur.append(ch)
        if cur:
            pieces.append("".join(cur))
        return pieces

    def _wordpiece(self, word: str) -> list[str]:
        if len(word) > 100:
            return [self.unk]
        pieces, start = [], 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.unk]
            pieces.append(cur)
            start = end
        return pieces

    def tokenize(self, text: str) -> list[str]:
        import unicodedata

        if self.do_lower_case:
            text = text.lower()
            text = unicodedata.normalize("NFD", text)
            text = "".join(c for c in text if unicodedata.category(c) != "Mn")
        words = []
        for w in self._clean(text).split():
            words.extend(self._split_punct(w))
        out = []
        for w in words:
            out.extend(self._wordpiece(w))
        return out

    def encode_batch(self, texts: list[str]) -> np.ndarray:
        """[CLS] tokens [SEP], padded — reference tokenize() output
        (text.py:36-50)."""
        ids = [
            [self.cls_id]
            + [self.vocab.get(t, self.vocab[self.unk]) for t in self.tokenize(x)]
            + [self.sep_id]
            for x in texts
        ]
        n = max(len(r) for r in ids)
        out = np.full((len(ids), n), self.pad_id, np.int32)
        for i, r in enumerate(ids):
            out[i, : len(r)] = r
        return out


class TextEmbedder:
    """Embedding table over a fixed vocabulary + NULL text.

    `__call__(texts)` -> (`[B, 768]` embeddings, `[B]` bool none-mask).
    """

    def __init__(self, classes: tuple[str, ...], table: np.ndarray):
        self.classes = tuple(classes)
        self.table = table
        self.index = {c: i for i, c in enumerate(self.classes)}

    @staticmethod
    def cache_path(dataset: str) -> str:
        return os.path.abspath(os.path.join(_CACHE_DIR, f"bert_{dataset}.npz"))

    @classmethod
    def build(
        cls,
        dataset: str,
        recompute: bool = False,
        model_name_or_path: str = "bert-base-cased",
    ) -> "TextEmbedder":
        """Load the cached table for a dataset, computing it if missing
        (from the hub or a local `--bert-path` weight drop)."""
        classes = DATASET_CLASSES[dataset]
        path = cls.cache_path(dataset)
        if os.path.exists(path) and not recompute:
            data = np.load(path, allow_pickle=True)
            cached = tuple(data["classes"].tolist())
            if cached == tuple(classes):
                return cls(classes, data["table"].astype(np.float32))
        table = bert_masked_mean_embed(list(classes), model_name_or_path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez(path, classes=np.array(classes, dtype=object), table=table)
        return cls(classes, table)

    @classmethod
    def random_for_testing(cls, classes: tuple[str, ...], seed: int = 0) -> "TextEmbedder":
        rng = np.random.RandomState(seed)
        return cls(classes, rng.randn(len(classes), BERT_MODEL_DIM).astype(np.float32))

    def __call__(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        none_mask = np.array([t == NULL_TEXT for t in texts], dtype=bool)
        idx = np.array([0 if m else self.index[t] for t, m in zip(texts, none_mask)])
        emb = self.table[idx]
        emb[none_mask] = 0.0  # value irrelevant; forced to null embedding downstream
        return emb.astype(np.float32), none_mask

    def ids(self, texts: list[str]) -> np.ndarray:
        return np.array([self.index[t] for t in texts], dtype=np.int32)


class JaxBertTextEncoder:
    """On-device free-text conditioning: host tokenizer + pure-JAX BERT
    (models/bert.py, parity-tested vs torch). Requires the HF checkpoint
    once (network or local dir) to convert weights; after that the serving
    path is torch-free."""

    def __init__(self, model_name_or_path: str = "bert-base-cased"):
        from transformers import BertModel

        from cvpr23_lfdm_tpu.models.bert import convert_hf_bert

        vocab = os.path.join(model_name_or_path, "vocab.txt")
        if os.path.isfile(vocab):
            # local weight drop: serve without the transformers tokenizer
            self.tokenizer = WordPieceTokenizer(vocab)
        else:
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
        torch_model = BertModel.from_pretrained(model_name_or_path)
        self.params = convert_hf_bert(torch_model.state_dict())
        del torch_model

    def _encode(self, texts: list[str]) -> np.ndarray:
        if isinstance(self.tokenizer, WordPieceTokenizer):
            return self.tokenizer.encode_batch(texts)[:, :512]
        enc = self.tokenizer(
            texts, padding=True, truncation=True, max_length=512,
            return_tensors="np",
        )
        return enc["input_ids"]

    def __call__(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        from cvpr23_lfdm_tpu.models.bert import bert_embed

        none_mask = np.array([t == NULL_TEXT for t in texts], dtype=bool)
        # np.array copies (np.asarray of a jax.Array is read-only)
        emb = np.array(bert_embed(self.params, self._encode(list(texts))))
        emb[none_mask] = 0.0
        return emb.astype(np.float32), none_mask
