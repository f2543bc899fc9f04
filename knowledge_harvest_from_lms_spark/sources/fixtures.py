"""Embedded relation-definition fixtures.

Small, public *data* excerpts from the reference's relation_info JSON
(reference ``relation_info/conceptnet.json`` keys ``CapableOf`` /
``AtLocation`` and ``relation_info/human.json`` key
``somebody_do_something_at``) so tests, `__spark_entry__` and the bench
do not depend on ``/root/reference`` being mounted at run time.

Schema per SURVEY.md §1.1 / FIXTURES.md §2:
``rel``, ``init_prompts``, ``prompts``, ``seed_ent_tuples`` — entities
use ``_`` for spaces, normalized at use.
"""

from __future__ import annotations

FIXTURE_RELATIONS: list[dict] = [
    {
        "rel": "CapableOf",
        "init_prompts": ["Something that <ENT0> can typically do is <ENT1> ."],
        "prompts": [
            "<ENT0> can <ENT1> .",
            "One thing that <ENT0> usually do is <ENT1> .",
            "A typical thing that a <ENT0> can do is to <ENT1> .",
        ],
        "seed_ent_tuples": [
            ["neighbor", "fence_property"],
            ["cook", "bread_filet"],
            ["plumbers", "fix_faucets"],
            ["teachers", "answer_questions"],
            ["criminals", "case_joint"],
        ],
    },
    {
        "rel": "AtLocation",
        "init_prompts": ["<ENT1> is the location for <ENT0> ."],
        "prompts": [
            "<ENT0> are found in <ENT1> .",
            "There may be <ENT0> in the <ENT1> .",
            "The <ENT0> is located in the <ENT1> .",
        ],
        "seed_ent_tuples": [
            ["flotation_device", "boat"],
            ["water", "soft_drink"],
            ["gear", "car"],
            ["giraffes", "africa"],
            ["trousers", "suitcase"],
        ],
    },
    {
        # Ternary relation — exercises dynamic arity (n_ents=3).
        "rel": "somebody_do_something_at",
        "init_prompts": ["<ENT0> can <ENT1> in <ENT2> ."],
        "prompts": [
            "At the <ENT2>, <ENT0> can <ENT1> .",
            "<ENT0>s can <ENT1> in the <ENT2> .",
            "The <ENT2> is a place where <ENT0> can <ENT1> .",
        ],
        "seed_ent_tuples": [
            ["people", "work_out", "gym"],
            ["bird", "fly", "sky"],
            ["student", "study", "classroom"],
            ["player", "play", "ground"],
            ["sodier", "fight", "battleground"],
        ],
    },
]
