"""Golden vectors for the Snowball English (Porter2) stemmer.

Pairs are from the published algorithm's own worked examples
(snowballstem.org/algorithms/english/stemmer.html) — the same algorithm
tantivy applies via rust-stemmers (reference config at
/root/reference/crates/spyglass-searcher/src/schema.rs:84).
"""

import pytest

from spyglass_spark.analysis.porter2 import stem

GOLDEN = [
    # step 1a
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "tie"),
    ("cries", "cri"),
    ("caress", "caress"),
    ("cats", "cat"),
    ("gas", "gas"),
    ("gaps", "gap"),
    # step 1b
    ("feed", "feed"),
    ("agreed", "agre"),
    ("plastered", "plaster"),
    ("bled", "bled"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"),
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"),
    ("tanned", "tan"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),
    ("hoping", "hope"),
    # step 1c
    ("happy", "happi"),
    ("sky", "sky"),
    ("by", "by"),
    ("say", "say"),
    ("cry", "cri"),
    ("enjoy", "enjoy"),
    # step 2
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),
    ("valenci", "valenc"),
    ("hesitanci", "hesit"),
    ("digitizer", "digit"),
    ("conformabli", "conform"),
    ("radicalli", "radic"),
    ("differentli", "differ"),
    ("vileli", "vile"),
    ("analogousli", "analog"),
    ("vietnamization", "vietnam"),
    ("predication", "predic"),
    ("operator", "oper"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("callousness", "callous"),
    ("formaliti", "formal"),
    ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    # step 3
    ("triplicate", "triplic"),
    # 'ative' fails its R2 condition in step 3; step 4 then strips 'ive'
    ("formative", "format"),
    ("formalize", "formal"),
    ("electriciti", "electr"),
    ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    # step 4
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"),
    ("defensible", "defens"),
    ("irritant", "irrit"),
    ("replacement", "replac"),
    ("adjustment", "adjust"),
    ("dependent", "depend"),
    ("adoption", "adopt"),
    ("communism", "communism"),  # commun prefix exception keeps R1 at 6
    ("activate", "activ"),
    ("angulariti", "angular"),
    ("homologous", "homolog"),
    ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    # step 5
    ("probate", "probat"),
    ("rate", "rate"),
    ("cease", "ceas"),
    ("controll", "control"),
    ("roll", "roll"),
    # exceptions
    ("skis", "ski"),
    ("skies", "sky"),
    ("dying", "die"),
    ("lying", "lie"),
    ("tying", "tie"),
    ("idly", "idl"),
    ("gently", "gentl"),
    ("ugly", "ugli"),
    ("early", "earli"),
    ("only", "onli"),
    ("singly", "singl"),
    ("news", "news"),
    ("atlas", "atlas"),
    ("cosmos", "cosmos"),
    ("bias", "bias"),
    ("andes", "andes"),
    ("inning", "inning"),
    ("outing", "outing"),
    ("canning", "canning"),
    ("herring", "herring"),
    ("earring", "earring"),
    ("proceed", "proceed"),
    ("exceed", "exceed"),
    ("succeed", "succeed"),
    # short words / identity
    ("a", "a"),
    ("be", "be"),
    ("on", "on"),
    ("generate", "generat"),
    ("generates", "generat"),
    ("generated", "generat"),
    ("generating", "generat"),
    ("general", "general"),
    ("generic", "generic"),
    ("generous", "generous"),
    ("communication", "communic"),
    # arsen- prefix pins R1=5; 'al' falls outside R2 → kept
    ("arsenal", "arsenal"),
    # code-ish tokens
    ("import", "import"),
    ("fn", "fn"),
    ("parsing", "pars"),
    ("parse", "pars"),
    ("parser", "parser"),
    ("indexes", "index"),
    ("indexing", "index"),
    ("searching", "search"),
    ("tokenizer", "token"),
]


@pytest.mark.parametrize("word,expected", GOLDEN)
def test_golden(word, expected):
    assert stem(word) == expected


def test_idempotent_on_numbers():
    assert stem("1234") == "1234"
    assert stem("x86") == "x86"
