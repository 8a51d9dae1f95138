"""Golden parity for the non-Qwen preprocessors (train_3d.py:388-994):
the REFERENCE functions are AST-extracted from
/root/reference/llava/train/train_3d.py (it imports deepspeed at module
scope, which isn't installed) and run against our
video3d_tpu.data.tokenization equivalents on a shared character-level
tokenizer whose specials (<s>, </s>, <|im_end|>, <end_of_turn>, ...) are
single tokens — the token-count regime the reference's masking arithmetic
assumes."""

import ast
import copy
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from video3d_tpu.data import conversation as our_conv
from video3d_tpu.data import tokenization as our_tok

REF_TRAIN = "/root/reference/llava/train/train_3d.py"
REF_CONV = "/root/reference/llava/conversation.py"
REF_MM = "/root/reference/llava/mm_utils.py"
HAS_REF = all(os.path.exists(p) for p in (REF_TRAIN, REF_CONV, REF_MM))

pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference tree absent")

WANTED_FUNCS = {
    "_tokenize_fn", "_mask_targets", "_add_speaker_and_signal",
    "preprocess_llama_2", "preprocess_gemma", "preprocess_llama3",
    "preprocess_v1", "preprocess_mpt", "preprocess_plain", "preprocess",
}


def _load_file_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    """Namespace holding the reference preprocess functions + its
    conversation module."""
    import torch
    import transformers
    from typing import Dict, List, Optional, Sequence

    # ref conversation.py calls AutoTokenizer.from_pretrained(llama3) at
    # module scope (safe_load_tokenizer swallows the failure, but the hub
    # retry loop wastes ~1 min offline) — fail it instantly
    def _offline(*a, **k):
        raise OSError("offline test environment")

    orig_fp = transformers.AutoTokenizer.from_pretrained
    transformers.AutoTokenizer.from_pretrained = _offline
    try:
        ref_conv = _load_file_module("ref_conversation", REF_CONV)
    finally:
        transformers.AutoTokenizer.from_pretrained = orig_fp

    # mm_utils needs llava.constants stubbed
    if "llava" not in sys.modules:
        pkg = types.ModuleType("llava")
        const = types.ModuleType("llava.constants")
        const.IMAGE_TOKEN_INDEX = -200
        pkg.constants = const
        sys.modules["llava"] = pkg
        sys.modules["llava.constants"] = const
    ref_mm = _load_file_module("ref_mm_utils", REF_MM)

    with open(REF_TRAIN) as f:
        tree = ast.parse(f.read())
    picked = [n for n in tree.body
              if isinstance(n, (ast.FunctionDef,))
              and n.name in WANTED_FUNCS]
    assert len(picked) == len(WANTED_FUNCS)
    module = ast.Module(body=picked, type_ignores=[])
    code = compile(module, REF_TRAIN, "exec")

    ns = {
        "torch": torch, "copy": copy, "transformers": transformers,
        "np": np, "Dict": Dict, "List": List, "Optional": Optional,
        "Sequence": Sequence, "conversation_lib": ref_conv,
        "tokenizer_image_token": ref_mm.tokenizer_image_token,
        "IGNORE_INDEX": -100, "IMAGE_TOKEN_INDEX": -200,
        "DEFAULT_IMAGE_TOKEN": "<image>",
        "IS_TOKENIZER_GREATER_THAN_0_14":
            our_tok.IS_TOKENIZER_GREATER_THAN_0_14,
        "rank0_print": print,
    }
    exec(code, ns)
    return types.SimpleNamespace(**{k: ns[k] for k in WANTED_FUNCS},
                                 conv=ref_conv)


SPECIALS = ["<pad>", "<unk>", "<s>", "</s>", "<|im_start|>", "<|im_end|>",
            "<end_of_turn>", "<start_of_turn>", "<image>"]


@pytest.fixture(scope="module")
def tok():
    """Character-level PreTrainedTokenizerFast: every char is one token,
    specials are single tokens, <s> prepended (sentencepiece-like counts)."""
    from tokenizers import Regex, Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Split
    from tokenizers.processors import TemplateProcessing
    from transformers import PreTrainedTokenizerFast

    chars = [chr(c) for c in range(32, 127)] + ["\n"]
    vocab = {t: i for i, t in enumerate(SPECIALS + chars)}
    t = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    t.pre_tokenizer = Split(Regex(r"[\s\S]"), behavior="isolated")
    t.post_processor = TemplateProcessing(
        single="<s> $A", pair="<s> $A $B",
        special_tokens=[("<s>", vocab["<s>"])])
    wrapped = PreTrainedTokenizerFast(
        tokenizer_object=t, bos_token="<s>", eos_token="</s>",
        unk_token="<unk>", pad_token="<pad>",
        additional_special_tokens=["<|im_start|>", "<|im_end|>",
                                   "<end_of_turn>", "<start_of_turn>",
                                   "<image>"])
    wrapped.model_max_length = 4096
    wrapped.legacy = False
    return wrapped


SOURCES = [
    [{"from": "human", "value": "<image>\nWhat is on the table?"},
     {"from": "gpt", "value": "A red mug."},
     {"from": "human", "value": "And under it?"},
     {"from": "gpt", "value": "A coaster."}],
    [{"from": "human", "value": "Describe the room."},
     {"from": "gpt", "value": "A small office with two desks."}],
]


def _check(ours, theirs):
    for got_i, got_l, want_i, want_l in zip(
            ours["input_ids"], ours["labels"],
            theirs["input_ids"], theirs["labels"]):
        np.testing.assert_array_equal(np.asarray(got_i),
                                      np.asarray(want_i).reshape(-1))
        np.testing.assert_array_equal(np.asarray(got_l),
                                      np.asarray(want_l).reshape(-1))


def _not_all_masked(ours):
    assert any((np.asarray(l) != -100).any() for l in ours["labels"]), \
        "labels fully masked — the golden comparison would be vacuous"


class TestPreprocessGolden:
    @pytest.mark.parametrize("has_image", [False, True])
    def test_v1(self, ref, tok, has_image):
        # the reference torch.stack's has_image ids -> equal lengths needed
        src = copy.deepcopy([SOURCES[0]] if has_image else [SOURCES[1]])
        # char-level tokenizer has no SP space-merge: the non-legacy -1
        # adjustment (train_3d.py:820-823) would desync the counts
        tok.legacy = True
        ref.conv.default_conversation = ref.conv.conv_vicuna_v1
        theirs = ref.preprocess_v1(copy.deepcopy(src), tok,
                                   has_image=has_image)
        ours = our_tok.preprocess_v1(src, tok, has_image=has_image)
        _check(ours, theirs)
        _not_all_masked(ours)

    @pytest.mark.parametrize("has_image", [False, True])
    def test_llama_2(self, ref, tok, has_image):
        # the reference torch.stack's has_image ids -> equal lengths needed
        src = copy.deepcopy([SOURCES[0]] if has_image else [SOURCES[1]])
        ref.conv.default_conversation = ref.conv.conv_llava_llama_2
        theirs = ref.preprocess_llama_2(copy.deepcopy(src), tok,
                                        has_image=has_image)
        ours = our_tok.preprocess_llama_2(src, tok, has_image=has_image)
        _check(ours, theirs)
        _not_all_masked(ours)

    @pytest.mark.parametrize("has_image", [False, True])
    def test_mpt(self, ref, tok, has_image):
        # the reference torch.stack's has_image ids -> equal lengths needed
        src = copy.deepcopy([SOURCES[0]] if has_image else [SOURCES[1]])
        tok.legacy = False   # mpt's legacy branch ADDS 1 (train_3d.py:903)
        ref.conv.default_conversation = ref.conv.conv_mpt
        theirs = ref.preprocess_mpt(copy.deepcopy(src), tok,
                                    has_image=has_image)
        ours = our_tok.preprocess_mpt(src, tok, has_image=has_image)
        _check(ours, theirs)
        _not_all_masked(ours)

    @pytest.mark.parametrize("has_image", [False, True])
    def test_gemma(self, ref, tok, has_image):
        # the reference torch.stack's has_image ids -> equal lengths needed
        src = copy.deepcopy([SOURCES[0]] if has_image else [SOURCES[1]])
        ref.conv.default_conversation = ref.conv.conv_gemma_instruct
        theirs = ref.preprocess_gemma(copy.deepcopy(src), tok,
                                      has_image=has_image)
        ours = our_tok.preprocess_gemma(src, tok, has_image=has_image)
        _check(ours, theirs)
        _not_all_masked(ours)

    def test_plain(self, ref, tok):
        src = [[{"from": "human", "value": "<image>"},
                {"from": "gpt", "value": "a kitchen scene"}]]
        ref.conv.default_conversation = ref.conv.conv_llava_plain
        theirs = ref.preprocess_plain(copy.deepcopy(src), tok)
        ours = our_tok.preprocess_plain(copy.deepcopy(src), tok)
        _check(ours, theirs)
        _not_all_masked(ours)

    @pytest.mark.parametrize("has_image", [False, True])
    def test_single_fallback_via_dispatch(self, ref, tok, has_image):
        # the reference torch.stack's has_image ids -> equal lengths needed
        src = copy.deepcopy([SOURCES[0]] if has_image else [SOURCES[1]])
        ref.conv.default_conversation = ref.conv.conv_vicuna_v0
        theirs = ref.preprocess(copy.deepcopy(src), tok,
                                has_image=has_image)
        ours = our_tok.preprocess(src, tok, has_image=has_image,
                                  conv=our_conv.conv_vicuna_v0)
        _check(ours, theirs)
        _not_all_masked(ours)

    @pytest.mark.parametrize("has_image", [False, True])
    def test_llama3(self, ref, has_image):
        """preprocess_llama3 (train_3d.py:676-760) drives the tokenizer only
        through apply_chat_template / convert_tokens_to_ids / add_tokens —
        compare on a fake llama3-style tokenizer."""

        class FakeLlama3Tok:
            specials = {"<|begin_of_text|>": 1000, "<|start_header_id|>": 1001,
                        "<|end_header_id|>": 1002, "<|eot_id|>": 1003,
                        "\n\n": 1004, "<image>": 1005}

            def __init__(self):
                self.added = False

            def add_tokens(self, toks, special_tokens=False):
                self.added = True

            def convert_tokens_to_ids(self, t):
                return self.specials.get(t, -1)

            def _content_ids(self, text):
                out = []
                for piece in text.split("<image>"):
                    out.extend(ord(c) % 800 for c in piece)
                    out.append(self.specials["<image>"])
                return out[:-1]

            def apply_chat_template(self, msgs):
                ids = [self.specials["<|begin_of_text|>"]]
                for m in msgs:
                    ids += [self.specials["<|start_header_id|>"]]
                    ids += [ord(c) % 800 for c in m["role"]]
                    ids += [self.specials["<|end_header_id|>"],
                            self.specials["\n\n"]]
                    ids += self._content_ids(m["content"])
                    ids += [self.specials["<|eot_id|>"]]
                return ids

        src = copy.deepcopy([SOURCES[0]] if has_image else [SOURCES[1]])
        theirs = ref.preprocess_llama3(copy.deepcopy(src), FakeLlama3Tok(),
                                       has_image=has_image)
        ours = our_tok.preprocess_llama3(src, FakeLlama3Tok(),
                                         has_image=has_image)
        _check(ours, theirs)
        _not_all_masked(ours)

    def test_dispatch_routes_by_template(self, tok):
        """Our dispatch mirrors train_3d.py:945-966."""
        src = [copy.deepcopy(SOURCES[1])]
        for conv, fn in [
            (our_conv.conv_vicuna_v1, our_tok.preprocess_v1),
            (our_conv.conv_llava_llama_2, our_tok.preprocess_llama_2),
            (our_conv.conv_mpt, our_tok.preprocess_mpt),
            (our_conv.conv_gemma_instruct, our_tok.preprocess_gemma),
        ]:
            via_dispatch = our_tok.preprocess(copy.deepcopy(src), tok,
                                              conv=conv)
            direct = fn(copy.deepcopy(src), tok)
            _check(via_dispatch, direct)
