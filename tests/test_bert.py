"""JAX BERT encoder parity vs torch transformers.BertModel (shared weights)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from cvpr23_lfdm_tpu.models.bert import (  # noqa: E402
    BertEncoder,
    BertSpec,
    bert_embed,
    convert_hf_bert,
)

SPEC = BertSpec(
    vocab_size=120, hidden_size=64, num_layers=3, num_heads=4,
    intermediate_size=128, max_position_embeddings=48, type_vocab_size=2,
)


@pytest.fixture(scope="module")
def pair():
    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    ref = BertModel(
        BertConfig(
            vocab_size=SPEC.vocab_size, hidden_size=SPEC.hidden_size,
            num_hidden_layers=SPEC.num_layers,
            num_attention_heads=SPEC.num_heads,
            intermediate_size=SPEC.intermediate_size,
            max_position_embeddings=SPEC.max_position_embeddings,
            type_vocab_size=SPEC.type_vocab_size,
            hidden_act="gelu", hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
    )
    ref.eval()
    params = convert_hf_bert(ref.state_dict(), SPEC)
    return ref, params


def test_bert_hidden_states_parity(pair):
    ref, params = pair
    rng = np.random.RandomState(0)
    ids = rng.randint(1, SPEC.vocab_size, (2, 9)).astype(np.int64)
    ids[0, 6:] = 0  # padding
    with torch.no_grad():
        theirs = ref(
            input_ids=torch.from_numpy(ids),
            attention_mask=(torch.from_numpy(ids) != 0).long(),
        ).last_hidden_state.numpy()
    ours = BertEncoder(SPEC).apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_bert_embed_matches_reference_semantics(pair):
    """Masked mean excluding [CLS] (DM/modules/text.py:56-89)."""
    ref, params = pair
    rng = np.random.RandomState(1)
    ids = rng.randint(1, SPEC.vocab_size, (2, 8)).astype(np.int64)
    ids[1, 5:] = 0
    with torch.no_grad():
        hidden = ref(
            input_ids=torch.from_numpy(ids),
            attention_mask=(torch.from_numpy(ids) != 0).long(),
        ).last_hidden_state
    mask = (torch.from_numpy(ids) != 0)[:, 1:, None].float()
    expected = ((hidden[:, 1:] * mask).sum(1) / (mask.sum(1) + 1e-8)).numpy()
    ours = bert_embed(params, jnp.asarray(ids), SPEC)
    np.testing.assert_allclose(np.asarray(ours), expected, atol=2e-5)


# -------------------------------------------------- WordPiece tokenizer


def test_wordpiece_tokenizer_matches_transformers(tmp_path):
    """Self-contained WordPiece (models/text.py) vs transformers.BertTokenizer
    built from the same local vocab file — the reference tokenize() path
    (DM/modules/text.py:36-50: special tokens + batch padding)."""
    from transformers import BertTokenizer

    from cvpr23_lfdm_tpu.models.text import WordPieceTokenizer

    vocab = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
        # class-name pieces (cased)
        "anger", "disgust", "fear", "happiness", "neutral", "sadness",
        "surprise", "right", "hand", "wave", "two", "front", "clap",
        "draw", "circle", "clockwise", "counter", "forward", "lunge",
        "left", "foot", "(", ")", "I", "Have", "Command", "Brakes",
        "On", "Off", "Nose", "##gear", "Steering", "jog", "##ging",
        "walk", "##ing", "s", "##quat",
    ]
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(vocab) + "\n")

    texts = [
        "anger",
        "right hand wave",
        "two hand front clap",
        "draw circle counter clockwise",
        "forward lunge (left foot forward)",
        "I Have Command",
        "Brakes On",
        "Nosegear Steering",   # multi-piece continuation
        "jogging",             # continuation "##ging"
        "squat",               # "s" + "##quat"
        "zzz unknownword",     # -> [UNK]
        "None",                # null token text -> [UNK] pieces, still tokenized
    ]

    hf = BertTokenizer(str(path), do_lower_case=False)
    expected = hf.batch_encode_plus(
        texts, add_special_tokens=True, padding=True, return_tensors="np"
    )["input_ids"]

    ours = WordPieceTokenizer(str(path)).encode_batch(texts)
    np.testing.assert_array_equal(ours, expected)
