"""Train the hermetic subword (byte-level BPE) tokenizer for navillm_tpu.

The reference tokenizes prompts with Vicuna's LlamaTokenizer
(models/modified_lm.py:56-87). This environment has no Vicuna tokenizer
asset and zero egress, so we train a byte-level BPE of similar
granularity (~1.3 tokens/word on English prompt text) over a
deterministic synthetic corpus built from:
  - the verbatim schema blocks (agents/prompts.py — fixed text every
    prompt repeats, so merges capture "### Candidate:", "<hist>" context
    lines, etc.),
  - templated English navigation instructions / CVDN dialogs / SOON
    target descriptions / QA pairs from a household-navigation word
    bank (the domain vocabulary of R2R/REVERIE/CVDN/SOON/ScanQA/EQA).

Output: navillm_tpu/models/bpe_nav.json (vendored; loaded by
models/tokenization.py:BPETokenizer). Re-run this script to regenerate —
it is deterministic (seeded).

Usage: python scripts/data_tools/train_bpe.py [--vocab 8000]
"""
from __future__ import annotations

import argparse
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

VERBS = ("walk past turn left right go straight continue stop enter exit "
         "climb descend cross follow proceed head move approach leave take "
         "pass reach stand wait face veer").split()
ROOMS = ("kitchen bedroom bathroom hallway living room dining room office "
         "lounge closet garage balcony staircase foyer laundry pantry attic "
         "basement porch corridor entryway").split()
OBJECTS = ("sofa couch table chair lamp bed door window mirror sink toilet "
           "shower bathtub refrigerator oven stove counter cabinet shelf "
           "picture painting plant vase rug carpet television fireplace "
           "desk bookshelf wardrobe dresser nightstand pillow towel curtain "
           "stairs railing bench stool piano clock statue").split()
COLORS = ("white black brown gray blue green red yellow wooden marble "
          "glass metal leather dark light large small round square tall "
          "short modern antique").split()
PREPS = ("near beside behind in front of next to across from between "
         "under above on the left of on the right of at the end of").split()
DIRS = "left right straight around back upstairs downstairs forward".split()
QWORDS = ("what color is the | how many chairs are in the | where is the | "
          "what is on the | what room is the | is there a").split("|")
ANSWERS = ("yes no one two three four five six the kitchen the bedroom "
           "white brown blue on the table next to the door").split()


def _sentence(rng: random.Random) -> str:
    t = rng.randrange(6)
    v, d = rng.choice(VERBS), rng.choice(DIRS)
    r, o = rng.choice(ROOMS), rng.choice(OBJECTS)
    c, p = rng.choice(COLORS), rng.choice(PREPS)
    if t == 0:
        return f"{v.capitalize()} {d} at the {c} {o}."
    if t == 1:
        return f"{v.capitalize()} into the {r} and {rng.choice(VERBS)} {p} the {o}."
    if t == 2:
        return f"{v.capitalize()} past the {o} {p} the {r}."
    if t == 3:
        return f"Turn {d} and {v} until you reach the {c} {o}."
    if t == 4:
        return f"Stop {p} the {o} in the {r}."
    return f"{v.capitalize()} through the {r}, then {rng.choice(VERBS)} {d}."


def _instruction(rng: random.Random) -> str:
    return " ".join(_sentence(rng) for _ in range(rng.randint(1, 5)))


def _dialog(rng: random.Random) -> str:
    o, r = rng.choice(OBJECTS), rng.choice(ROOMS)
    q = f"Question: should I {rng.choice(VERBS)} {rng.choice(DIRS)} towards the {o}?"
    a = f"Answer: {rng.choice(['yes', 'no'])}, {_sentence(rng).lower()}"
    return f"Target: {o} {q} {a}"


def _soon_target(rng: random.Random) -> str:
    c, o, p, r = (rng.choice(COLORS), rng.choice(OBJECTS), rng.choice(PREPS),
                  rng.choice(ROOMS))
    return (f"I want to find a {c} {o}. It is {p} the {rng.choice(OBJECTS)} "
            f"in the {r}. The room is {rng.choice(COLORS)} and "
            f"{rng.choice(COLORS)}.")


def _qa(rng: random.Random) -> str:
    q = rng.choice(QWORDS).strip()
    return (f"{q} {rng.choice(OBJECTS)} in the {rng.choice(ROOMS)}? "
            f"{rng.choice(ANSWERS)}")


def build_corpus(n: int = 30000, seed: int = 0):
    from navillm_tpu.agents import prompts as P
    rng = random.Random(seed)
    lines = []
    # schema text at realistic frequencies: every prompt contains it
    for i in range(600):
        task = rng.choice(["r2r", "cvdn", "reverie", "soon", "eqa"])
        instr = {"cvdn": _dialog, "soon": _soon_target}.get(
            task, _instruction)(rng)
        lines.append(P.navigation_prompt(task, instr, rng.randint(0, 12),
                                         rng.randint(2, 8), "<cls_1>"))
        if i % 3 == 0:
            lines.append(P.summarization_prompt(
                rng.choice(["r2r", "reverie", "soon"]), instr,
                rng.randint(0, 12), rng.randint(0, 8)))
    makers = [_instruction, _dialog, _soon_target, _qa]
    for _ in range(n):
        lines.append(rng.choice(makers)(rng))
    return lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=8000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers
    from navillm_tpu.models.tokenization import SPECIAL_TOKENS

    tok = Tokenizer(models.BPE())
    # byte-level: every string is encodable, no <unk> ever needed
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    control = ["<unk>", "<s>", "</s>", "<PAD>"] + SPECIAL_TOKENS
    trainer = trainers.BpeTrainer(
        vocab_size=args.vocab, special_tokens=control, show_progress=False,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    corpus = build_corpus()
    tok.train_from_iterator(corpus, trainer)

    out = Path(args.out) if args.out else (
        Path(__file__).resolve().parents[2]
        / "navillm_tpu" / "models" / "bpe_nav.json")
    tok.save(str(out))
    # quick stats
    n_tok = sum(len(tok.encode(s).ids) for s in corpus[:500])
    n_words = sum(len(s.split()) for s in corpus[:500])
    print(f"saved {out} vocab={tok.get_vocab_size()} "
          f"tokens/word={n_tok / n_words:.2f}")


if __name__ == "__main__":
    main()
