"""Shallow boilerplate classifier over block features (M7/M8 replacement).

The reference ships field extraction out to GPT-4V / Gemini per block
(/root/reference/ai_documents/analysis/lmm/gpt.py:20-164, gemini.py:19-132).
We replace the external LMM with a deterministic Boilerpipe/Readability-style
density classifier over the (prev, cur, next) block-feature triple — pure
integer threshold rules, no floats, no randomness, so extracted text is
byte-reproducible.

Frozen rules (changing any constant invalidates every golden fixture):
  R1 dense    : n_words >= 10 AND 3*link_text_len <= text_len AND not chrome
  R2 heading  : h1..h6, 3*link_text_len <= text_len, not chrome, and the next
                block (if any) is dense
  R3 bridge   : short block (n_words < 10), zero link text, not chrome,
                sandwiched between two accepted blocks
"""

from __future__ import annotations

from dataclasses import dataclass

from .tokenizer import Block

W_MIN = 10          # R1 word threshold
LD_NUM, LD_DEN = 1, 3  # link-density threshold = LD_NUM/LD_DEN


@dataclass(frozen=True)
class ClassifierConfig:
    """Tunable thresholds for the sweep harness (operators/tuning.py).
    The default instance IS the frozen policy — extraction behavior is
    unchanged unless a sweep explicitly passes another config."""

    w_min: int = W_MIN
    ld_num: int = LD_NUM
    ld_den: int = LD_DEN


_FROZEN = ClassifierConfig()


def _low_link(b: Block, cfg: ClassifierConfig) -> bool:
    return cfg.ld_den * b.link_text_len <= cfg.ld_num * b.text_len


def classify_blocks(
    blocks: list[Block], cfg: ClassifierConfig = _FROZEN
) -> list[bool]:
    """Return is_content per block (same order)."""
    n = len(blocks)
    dense = [
        (b.n_words >= cfg.w_min) and _low_link(b, cfg) and not b.in_chrome
        and not b.is_heading
        for b in blocks
    ]
    accepted = list(dense)
    # R2: headings promoted by a dense successor (scan right-to-left so a
    # heading directly above another promoted heading also promotes).
    for i in range(n - 1, -1, -1):
        b = blocks[i]
        if (
            b.is_heading
            and not b.in_chrome
            and _low_link(b, cfg)
            and i + 1 < n
            and accepted[i + 1]
        ):
            accepted[i] = True
    # R3: short low-link bridges between accepted neighbours.
    out = list(accepted)
    for i, b in enumerate(blocks):
        if (
            not out[i]
            and b.n_words < cfg.w_min
            and b.link_text_len == 0
            and not b.in_chrome
            and not b.is_heading
            and 0 < i < n - 1
            and accepted[i - 1]
            and accepted[i + 1]
        ):
            out[i] = True
    return out
