"""ChatML tokenization with the IMAGE_TOKEN splice contract.

Reproduces the two reference tokenization paths bit-for-bit:
  * training: ``preprocess_qwen`` (train_3d.py:601-674) — per-message ChatML
    encoding, user/system turns masked, ``[198 ('\\n'), im_start, im_end]``
    unmasked, ``<image>`` mapped to IMAGE_TOKEN_INDEX;
  * eval: manual ChatML id assembly with an empty assistant turn
    (model_scanqa.py:29-80).

Works with any HF-style tokenizer exposing ``encode/__call__`` and the two
additional special tokens ``<|im_start|>``/``<|im_end|>``; tests use a fake
deterministic tokenizer with the same interface.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from video3d_tpu.constants import (DEFAULT_IMAGE_TOKEN, IGNORE_INDEX,
                                   IMAGE_TOKEN_INDEX)

NEWLINE_TOKEN_ID = 198  # '\n' in the Qwen2 BPE vocab (train_3d.py:615)


def tokenizer_image_token(prompt: str, tokenizer,
                          image_token_index: int = IMAGE_TOKEN_INDEX) -> List[int]:
    """Split on '<image>' and insert the sentinel id (mm_utils.py:341-360).

    Matches the reference's interleaving: chunks are tokenized separately;
    a leading BOS (if the first chunk has one) is kept once.
    """
    chunks = [tokenizer(c).input_ids for c in prompt.split(DEFAULT_IMAGE_TOKEN)]

    def insert_separator(X, sep):
        return [ele for sublist in zip(X, [sep] * len(X)) for ele in sublist][:-1]

    input_ids: List[int] = []
    offset = 0
    if chunks and len(chunks[0]) > 0 and getattr(tokenizer, "bos_token_id", None) is not None \
            and chunks[0][0] == tokenizer.bos_token_id:
        offset = 1
        input_ids.append(chunks[0][0])
    for x in insert_separator(chunks, [image_token_index] * (offset + 1)):
        input_ids.extend(x[offset:])
    return input_ids


def _chatml_ids(tokenizer):
    """(im_start, im_end) ids looked up by token text — robust to tokenizers
    whose additional_special_tokens list other tokens first (the reference
    unpacks additional_special_tokens_ids positionally, train_3d.py:614)."""
    return (tokenizer.convert_tokens_to_ids("<|im_start|>"),
            tokenizer.convert_tokens_to_ids("<|im_end|>"))


def _chatml_turn_ids(tokenizer, role: str, content: str) -> List[int]:
    """ids of '<|im_start|>role\\ncontent<|im_end|>\\n' — what the reference's
    overridden chat template produces per message (train_3d.py:619)."""
    im_start, im_end = _chatml_ids(tokenizer)
    return ([im_start] + tokenizer(f"{role}\n{content}").input_ids
            + [im_end] + tokenizer("\n").input_ids)


def preprocess_qwen(sources: Sequence[Sequence[Dict]], tokenizer,
                    has_image: bool = False,
                    system_message: str = "You are a helpful assistant.",
                    image_token_id: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Training-side ChatML tokenization + label masking (train_3d.py:601-674).

    Args:
      sources: list of conversations; each message has from/value (or
        role/content) keys with roles human/gpt (or user/assistant).
      image_token_id: id that '<image>' tokenizes to (the reference adds it
        as a special token; pass the id your tokenizer assigns).
    Returns:
      dict(input_ids (B, L) int64, labels (B, L) int64) — unpadded per-sample
      lists stacked only when lengths match; otherwise lists.
    """
    roles = {"human": "user", "gpt": "assistant"}
    im_start, im_end = _chatml_ids(tokenizer)
    unmask = {NEWLINE_TOKEN_ID, im_start, im_end}
    if image_token_id is None:
        image_token_id = tokenizer.convert_tokens_to_ids(DEFAULT_IMAGE_TOKEN)

    input_ids, targets = [], []
    for source in sources:
        first_from = source[0].get("from", source[0].get("role"))
        if roles.get(first_from, first_from) != "user":
            source = source[1:]

        ids: List[int] = []
        labs: List[int] = []

        sys_ids = _chatml_turn_ids(tokenizer, "system", system_message)
        ids += sys_ids
        labs += [IGNORE_INDEX] * len(sys_ids)

        for conv in source:
            role = conv.get("role", conv.get("from"))
            content = conv.get("content", conv.get("value"))
            role = roles.get(role, role)
            enc = _chatml_turn_ids(tokenizer, role, content)
            ids += enc
            labs += [IGNORE_INDEX] * len(enc) if role in ("user", "system") else list(enc)

        assert len(ids) == len(labs)
        for i, tok in enumerate(ids):
            if tok in unmask:
                labs[i] = tok
            if tok == image_token_id:
                ids[i] = IMAGE_TOKEN_INDEX
        input_ids.append(np.asarray(ids, np.int64))
        targets.append(np.asarray(labs, np.int64))

    return {"input_ids": input_ids, "labels": targets}


def preprocess_qwen_eval(source: Sequence[Dict], tokenizer,
                         system_message: str = "You are a helpful assistant.") -> List[int]:
    """Eval-side prompt ids: system + turns + empty assistant generation
    header (model_scanqa.py:29-80). '<image>' inside content becomes the
    IMAGE_TOKEN_INDEX sentinel."""
    roles = {"human": "user", "gpt": "assistant"}
    im_start, im_end = _chatml_ids(tokenizer)
    nl = tokenizer("\n").input_ids

    ids: List[int] = []
    ids += _chatml_turn_ids(tokenizer, "system", system_message)
    for conv in source:
        role = roles.get(conv.get("from", conv.get("role")),
                         conv.get("from", conv.get("role")))
        content = conv.get("value", conv.get("content"))
        if content:
            if DEFAULT_IMAGE_TOKEN in content:
                pieces = content.split(DEFAULT_IMAGE_TOKEN)
                body: List[int] = tokenizer(f"{role}\n").input_ids if pieces[0] == "" else \
                    tokenizer(f"{role}\n{pieces[0]}").input_ids
                turn = [im_start] + body
                for piece in pieces[1:]:
                    turn += [IMAGE_TOKEN_INDEX] + tokenizer(piece).input_ids
                turn += [im_end] + nl
            else:
                turn = _chatml_turn_ids(tokenizer, role, content)
            ids += turn
        else:
            # generation header: '<|im_start|>assistant\n'
            ids += [im_start] + tokenizer(f"{role}\n").input_ids
    return ids
