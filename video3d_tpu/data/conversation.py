"""Conversation templates.

The reference carries a large template zoo inherited from LLaVA-NeXT
(conversation.py:11-585); the Video-3D-LLM recipe uses exactly one —
``qwen_1_5`` ChatML (conversation.py:443-452): system "You are a helpful
assistant.", ``<|im_start|>role\\ncontent<|im_end|>\\n`` turns. We implement
that one as the default plus the generic dataclass so other templates can be
registered.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, List, Optional, Tuple


class SeparatorStyle(enum.Enum):
    CHATML = enum.auto()
    TWO = enum.auto()
    PLAIN = enum.auto()


@dataclasses.dataclass
class Conversation:
    system: str
    roles: Tuple[str, str]
    messages: List[Tuple[str, Optional[str]]]
    sep_style: SeparatorStyle = SeparatorStyle.CHATML
    sep: str = "<|im_end|>"
    version: str = "qwen_1_5"

    def append_message(self, role: str, message: Optional[str]) -> None:
        self.messages.append((role, message))

    def get_prompt(self) -> str:
        if self.sep_style == SeparatorStyle.CHATML:
            out = "" if self.system == "" else self.system + self.sep + "\n"
            for role, message in self.messages:
                if message:
                    if isinstance(message, tuple):
                        message = message[0]
                    out += role + "\n" + message + self.sep + "\n"
                else:
                    out += role + "\n"
            return out
        if self.sep_style == SeparatorStyle.PLAIN:
            return "".join((m or "") + self.sep for _, m in self.messages)
        raise ValueError(self.sep_style)

    def copy(self) -> "Conversation":
        return Conversation(system=self.system, roles=self.roles,
                            messages=list(self.messages),
                            sep_style=self.sep_style, sep=self.sep,
                            version=self.version)


conv_qwen = Conversation(
    system="<|im_start|>system\nYou are a helpful assistant.",
    roles=("<|im_start|>user", "<|im_start|>assistant"),
    messages=[],
    sep_style=SeparatorStyle.CHATML,
    sep="<|im_end|>",
    version="qwen_1_5",
)

conv_templates: Dict[str, Conversation] = {
    "qwen_1_5": conv_qwen,
    "qwen_2": conv_qwen,
}

default_conversation = conv_qwen
