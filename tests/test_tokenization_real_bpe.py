"""preprocess_qwen golden on a REAL byte-level BPE tokenizer.

Round-1 goldens ran on character-level fake tokenizers; the
``[198, im_start, im_end]`` unmask magic (train_3d.py:615) is
vocabulary-specific. The true Qwen2 vocab/merges data cannot be vendored
offline (no network, no cache in the image — VERDICT r1 #10), but its
STRUCTURE can: Qwen2 inherits GPT-2's byte-level BPE base alphabet, whose
256 single-byte token ids are ALGORITHMIC (printable bytes 33-126 first,
then 161-172, 174-255, then the remapped control bytes in byte order) —
placing '\\n' ('Ċ') at id **198**, exactly the id the reference hardcodes.
This fixture rebuilds that base alphabet at the true ids, adds a handful of
merges (fake ids >= 256, exercising multi-token words), and registers
<|endoftext|>/<|im_start|>/<|im_end|> at their true Qwen2 ids
151643/151644/151645 as additional special tokens — so every id the
masking arithmetic depends on is the production one.

The golden: the reference's own ``preprocess_qwen`` (AST-extracted from
train_3d.py, which cannot be imported — it imports deepspeed) run on this
tokenizer must produce ids/labels identical to ours.
"""

import ast
import copy
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from video3d_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from video3d_tpu.data.tokenization import NEWLINE_TOKEN_ID, preprocess_qwen

REF_TRAIN = "/root/reference/llava/train/train_3d.py"


def _gpt2_bytes_to_unicode():
    """GPT-2's byte->unicode map (tokenization_gpt2.bytes_to_unicode)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def make_qwen2_bpe_tokenizer():
    """PreTrainedTokenizerFast with the true Qwen2 byte-token/special ids."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    b2u = _gpt2_bytes_to_unicode()
    # true id order: the order bytes appear in bytes_to_unicode()'s bs list
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    bs += [b for b in range(256) if b not in bs]
    vocab = {b2u[b]: i for i, b in enumerate(bs)}
    assert vocab[b2u[ord("\n")]] == 198          # the hardcoded newline id

    # a few merges so common words become single multi-byte tokens (ids
    # >= 256 are NOT claimed to match production — only the byte alphabet
    # and specials carry true ids, which is all the masking logic uses)
    merges = []
    nid = 256

    def add_merge(a, b):
        nonlocal nid
        merges.append((a, b))
        if a + b not in vocab:
            vocab[a + b] = nid
            nid += 1

    for a, b in (("h", "e"), ("t", "he"), ("Ġ", "the"), ("i", "s"),
                 ("Ġ", "is"), ("a", "n"), ("an", "t"), ("s", "ant"),
                 ("i", "st"), ("s", "t"), ("Ġ", "a"), ("e", "r"),
                 ("u", "s"), ("us", "er")):
        add_merge(a, b)

    # true Qwen2 special-token ids
    vocab["<|endoftext|>"] = 151643
    vocab["<|im_start|>"] = 151644
    vocab["<|im_end|>"] = 151645

    tk = Tokenizer(models.BPE(vocab=vocab, merges=merges))
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tk.decoder = decoders.ByteLevel()
    tok = PreTrainedTokenizerFast(
        tokenizer_object=tk,
        eos_token="<|endoftext|>",
        additional_special_tokens=["<|im_start|>", "<|im_end|>"],
        model_max_length=32768)
    return tok


@pytest.fixture(scope="module")
def tok():
    return make_qwen2_bpe_tokenizer()


@pytest.fixture(scope="module")
def ref_preprocess_qwen():
    """AST-extract the reference's preprocess_qwen (train_3d.py:601-668)."""
    if not os.path.exists(REF_TRAIN):
        pytest.skip("reference tree absent")
    import torch
    import transformers

    with open(REF_TRAIN) as f:
        tree = ast.parse(f.read())
    picked = [n for n in tree.body if isinstance(n, ast.FunctionDef)
              and n.name == "preprocess_qwen"]
    assert picked, "preprocess_qwen not found in reference"
    mod = ast.Module(body=picked, type_ignores=[])
    ns = {"transformers": transformers, "torch": torch, "copy": copy,
          "IGNORE_INDEX": IGNORE_INDEX, "IMAGE_TOKEN_INDEX": IMAGE_TOKEN_INDEX,
          "Dict": dict}
    exec(compile(mod, REF_TRAIN, "exec"), ns)
    return ns["preprocess_qwen"]


CONVS = [
    [{"from": "human", "value": "<image>\nis the user there"},
     {"from": "gpt", "value": "the assistant is here"}],
    [{"from": "human", "value": "is he a user"},
     {"from": "gpt", "value": "he is"},
     {"from": "human", "value": "the user is the assistant"},
     {"from": "gpt", "value": "an assistant is a user"}],
]


class TestFixtureIsRealBPE:
    def test_newline_is_198(self, tok):
        assert tok("\n").input_ids == [NEWLINE_TOKEN_ID]

    def test_special_ids_are_production(self, tok):
        assert tok.convert_tokens_to_ids("<|im_start|>") == 151644
        assert tok.convert_tokens_to_ids("<|im_end|>") == 151645
        assert tok.additional_special_tokens_ids == [151644, 151645]

    def test_multibyte_word_tokens(self, tok):
        # real-BPE regime: words are NOT one-token-per-char, spaces fold
        # into the following token (Ġ)
        ids = tok("the user").input_ids
        assert len(ids) < len("the user")
        assert all(i < 152064 for i in ids)

    def test_byte_fallback_roundtrip(self, tok):
        s = "unseen-wordz 42!"
        assert tok.decode(tok(s).input_ids) == s


class TestPreprocessQwenGolden:
    @pytest.mark.parametrize("idx", range(len(CONVS)))
    @pytest.mark.parametrize("has_image", [False, True])
    def test_ids_and_labels_match_reference(self, tok, ref_preprocess_qwen,
                                            idx, has_image):
        src = CONVS[idx]
        if has_image and "<image>" not in src[0]["value"]:
            src = copy.deepcopy(src)
            src[0]["value"] = "<image>\n" + src[0]["value"]
        ref = ref_preprocess_qwen([src], copy.deepcopy(tok),
                                  has_image=has_image)
        # the reference deepcopies + add_tokens itself; our caller contract
        # is a tokenizer that already knows <image> (dataset setup does it)
        ours_tok = copy.deepcopy(tok)
        if has_image:
            ours_tok.add_tokens(["<image>"], special_tokens=True)
        ours = preprocess_qwen([src], ours_tok, has_image=has_image)
        np.testing.assert_array_equal(
            np.asarray(ours["input_ids"][0]), ref["input_ids"][0].numpy())
        np.testing.assert_array_equal(
            np.asarray(ours["labels"][0]), ref["labels"][0].numpy())

    def test_unmask_magic_on_true_vocab(self, tok, ref_preprocess_qwen):
        """The [198, im_start, im_end] unmask behavior at production ids."""
        ours_tok = copy.deepcopy(tok)
        ours_tok.add_tokens(["<image>"], special_tokens=True)
        out = preprocess_qwen([CONVS[0]], ours_tok, has_image=True)
        ids = np.asarray(out["input_ids"][0])
        labels = np.asarray(out["labels"][0])
        for magic in (NEWLINE_TOKEN_ID, 151644, 151645):
            at = ids == magic
            assert at.any()
            np.testing.assert_array_equal(labels[at], ids[at])
        # user-turn content stays masked
        assert (labels == IGNORE_INDEX).any()
