"""Quantify METEOR 1.0-vs-1.5 drift on a 200+-pair synthetic caption
fixture (VERDICT r2 #6; the round-2 number came from only 8 pairs).

The two scorers differ by design (parameters, module weights,
content/function discounting) — what matters for ranking systems is RANK
agreement. This script builds 220 deterministic (hypothesis, references)
pairs from indoor-scene base captions with graded corruptions (drops,
synonym/paraphrase swaps, shuffles, truncations, unrelated noise), scores
both implementations, and prints one JSON line:
pearson / spearman / mean|diff| / per-corruption means. Run:

    python scripts/eval/meteor_drift.py

Numbers recorded in PARITY.md; asserted (spearman > 0.9) in
tests/test_meteor15.py::TestDrift200.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

from video3d_tpu.eval.metrics.meteor import meteor_sentence   # noqa: E402
from video3d_tpu.eval.metrics.meteor15 import Meteor15        # noqa: E402
from video3d_tpu.eval.metrics.meteor_data import (            # noqa: E402
    PARAPHRASE_PAIRS, SYNONYM_GROUPS)

BASES = [
    "a brown wooden chair stands next to the small table",
    "the white refrigerator is in the corner of the kitchen",
    "two soft pillows lie on the large bed near the window",
    "a black computer monitor sits on the office desk",
    "the blue recycling bin is near the open door",
    "a tall bookshelf full of old books against the wall",
    "the round mirror hangs above the bathroom sink",
    "a grey couch faces the television in the living room",
    "the ceiling lamp lights the narrow hallway",
    "a red backpack leans against the wooden cabinet",
    "the curtains cover the window behind the radiator",
    "a small plant in a white pot on the windowsill",
    "the trash can under the desk is almost full",
    "a framed picture of a mountain hangs on the wall",
    "the washing machine is between the sink and the dryer",
    "a ladder leans on the wall beside the tall shelf",
    "the piano stands in the middle of the room",
    "two chairs are placed on the left side of the table",
    "the copier machine is in front of the office window",
    "a yellow towel hangs on the rack near the bathtub",
]

UNRELATED = "quantum harmonics perturb stellar accretion manifolds rapidly"


def _syn_map():
    m = {}
    for group in SYNONYM_GROUPS:
        for w in group:
            m.setdefault(w, [x for x in group if x != w])
    return m


def make_fixture(n_per_base: int = 11, seed: int = 0):
    """220 (hyp, [ref]) pairs: each base caption under 11 corruptions."""
    rng = np.random.default_rng(seed)
    syn = _syn_map()
    par = {}
    for a, b in PARAPHRASE_PAIRS:
        par.setdefault(a, []).append(b)
        par.setdefault(b, []).append(a)
    pairs = []

    def swap(words, table):
        out, hit = [], False
        for w in words:
            if not hit and w in table:
                out.append(table[w][int(rng.integers(len(table[w])))])
                hit = True
            else:
                out.append(w)
        return out

    for base in BASES:
        ref = base.split()
        variants = []
        variants.append(("identity", ref))
        variants.append(("syn_swap", swap(ref, syn)))
        variants.append(("par_swap", swap(ref, par)))
        d = list(ref)
        for _ in range(2):
            d.pop(int(rng.integers(len(d))))
        variants.append(("drop2", d))
        d = list(ref)
        for _ in range(min(4, len(d) - 2)):
            d.pop(int(rng.integers(len(d))))
        variants.append(("drop4", d))
        sh = list(ref)
        rng.shuffle(sh)
        variants.append(("shuffle", sh))
        variants.append(("halftrunc", ref[:max(2, len(ref) // 2)]))
        variants.append(("head3", ref[:3]))
        ins = list(ref)
        extra = UNRELATED.split()
        for w in extra[:3]:
            ins.insert(int(rng.integers(len(ins) + 1)), w)
        variants.append(("insert3", ins))
        mix = ref[:len(ref) // 2] + extra[:4]
        variants.append(("halfmix", mix))
        variants.append(("unrelated", extra))
        for kind, hyp in variants[:n_per_base]:
            pairs.append((kind, " ".join(hyp), [base]))
    return pairs


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(float)
    rb = np.argsort(np.argsort(b)).astype(float)
    return float(np.corrcoef(ra, rb)[0, 1])


def main():
    pairs = make_fixture()
    m15 = Meteor15()
    kinds, s10, s15 = [], [], []
    for kind, hyp, refs in pairs:
        kinds.append(kind)
        s10.append(meteor_sentence(hyp, refs))
        s15.append(m15.sentence_score(hyp, refs))
    s10, s15 = np.asarray(s10), np.asarray(s15)
    by_kind = {}
    for k in sorted(set(kinds)):
        sel = np.asarray([x == k for x in kinds])
        by_kind[k] = {"m10": round(float(s10[sel].mean()), 4),
                      "m15": round(float(s15[sel].mean()), 4)}
    out = {
        "pairs": len(pairs),
        "pearson": round(float(np.corrcoef(s10, s15)[0, 1]), 4),
        "spearman": round(spearman(s10, s15), 4),
        "mean_abs_diff": round(float(np.abs(s10 - s15).mean()), 4),
        "mean_m10": round(float(s10.mean()), 4),
        "mean_m15": round(float(s15.mean()), 4),
        "by_kind": by_kind,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
