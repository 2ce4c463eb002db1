#!/usr/bin/env python
"""Train the shipped NER perceptron model (deterministic, offline).

Generates a synthetic BIO-labeled corpus from sentence templates with
person / location / org slots, trains the averaged perceptron
(nlp4l_spark/ops/ner.py::train_perceptron), and writes the pickle-free
TSV model to nlp4l_spark/data/models/ner_perceptron.tsv — the committed
artifact q_ner_entities loads. Rerunning reproduces the same file
byte-for-byte (seeded shuffles, sorted serialization).

The name lists are split: *_TRAIN fill the training templates, *_HELD
never appear in training — tests/test_new_ops.py asserts the model tags
held-out names correctly from context/shape features alone, which is
the property separating a learned model from the TrieTagger dictionary.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nlp4l_spark.ops.ner import train_perceptron  # noqa: E402

GIVEN_TRAIN = ["Alice", "Bob", "Carol", "David", "Erin", "Frank", "Grace"]
SUR_TRAIN = ["Smith", "Jones", "Miller", "Davis", "Garcia", "Chen", "Patel"]
CITY_TRAIN = ["London", "Tokyo", "Paris", "Berlin", "Osaka", "Madrid", "Cairo"]
ORG_TRAIN = ["Acme", "Globex", "Initech", "Umbrella", "Hooli", "Vandelay"]

# held out for the generalization test — never seen in training
GIVEN_HELD = ["Nadia", "Oscar"]
SUR_HELD = ["Okafor", "Lindqvist"]
CITY_HELD = ["Nairobi", "Gdansk"]
ORG_HELD = ["Zorblax", "Quuxco"]

# templates: tokens, with slots; slot fillers get B-/I- labels
TEMPLATES = [
    (["Mr", "{SUR}", "met", "Ms", "{SUR2}", "in", "{CITY}", "."],
     {"{SUR}": "person", "{SUR2}": "person", "{CITY}": "location"}),
    (["{GIVEN}", "{SUR}", "joined", "{ORG}", "Corp", "last", "year", "."],
     {"{GIVEN} {SUR}": "person", "{ORG} Corp": "org"}),
    (["The", "office", "in", "{CITY}", "closed", "early", "."],
     {"{CITY}": "location"}),
    (["Dr", "{SUR}", "flew", "from", "{CITY}", "to", "{CITY2}", "."],
     {"{SUR}": "person", "{CITY}": "location", "{CITY2}": "location"}),
    (["{ORG}", "Inc", "hired", "{GIVEN}", "{SUR}", "."],
     {"{ORG} Inc": "org", "{GIVEN} {SUR}": "person"}),
    (["Contact", "{GIVEN}", "at", "the", "{CITY}", "branch", "."],
     {"{GIVEN}": "person", "{CITY}": "location"}),
    (["Nothing", "notable", "happened", "today", "."], {}),
    (["The", "quarterly", "report", "is", "ready", "."], {}),
]


def expand() -> list[tuple[list[str], list[str]]]:
    out = []
    gi = si = ci = oi = 0
    for rep in range(40):
        for tokens_t, slots in TEMPLATES:
            fills = {
                "{GIVEN}": GIVEN_TRAIN[gi % len(GIVEN_TRAIN)],
                "{SUR}": SUR_TRAIN[si % len(SUR_TRAIN)],
                "{SUR2}": SUR_TRAIN[(si + 3) % len(SUR_TRAIN)],
                "{CITY}": CITY_TRAIN[ci % len(CITY_TRAIN)],
                "{CITY2}": CITY_TRAIN[(ci + 2) % len(CITY_TRAIN)],
                "{ORG}": ORG_TRAIN[oi % len(ORG_TRAIN)],
            }
            gi, si, ci, oi = gi + 1, si + 1, ci + 1, oi + 1
            tokens = [fills.get(t, t) for t in tokens_t]
            tags = ["O"] * len(tokens)
            for slot_phrase, typ in slots.items():
                phrase = [fills.get(p, p) for p in slot_phrase.split()]
                for i in range(len(tokens) - len(phrase) + 1):
                    if tokens[i : i + len(phrase)] == phrase:
                        tags[i] = f"B-{typ}"
                        for k in range(1, len(phrase)):
                            tags[i + k] = f"I-{typ}"
                        break
            out.append((tokens, tags))
    return out


def main() -> None:
    corpus = expand()
    model = train_perceptron(corpus, epochs=8, seed=13)
    # training-set accuracy as a sanity line
    ok = tot = 0
    for tokens, gold in corpus:
        pred = model._decode(tokens)
        ok += sum(p == g for p, g in zip(pred, gold))
        tot += len(gold)
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "nlp4l_spark", "data", "models", "ner_perceptron.tsv",
    )
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    model.save(dst)
    n_weights = sum(len(v) for v in model.weights.values())
    print(
        f"trained on {len(corpus)} sentences, token acc {ok}/{tot} "
        f"({ok / tot:.3f}), {n_weights} weights -> {dst}"
    )


if __name__ == "__main__":
    main()
