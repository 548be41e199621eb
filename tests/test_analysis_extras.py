from lucene_solr_ray.analysis import tokenize
from lucene_solr_ray.analysis.extras import (
    ascii_folding_filter,
    chain,
    edge_ngram_filter,
    keyword_marker,
    length_filter,
    ngram_filter,
    porter_stem,
    porter_stem_filter,
    shingle_filter,
    stop_filter,
)


def test_ngram():
    f = ngram_filter(2, 3)
    assert f([("abcd", 0)]) == [("ab", 0), ("bc", 0), ("cd", 0), ("abc", 0), ("bcd", 0)]


def test_edge_ngram():
    f = edge_ngram_filter(1, 3)
    assert f([("abcd", 5)]) == [("a", 5), ("ab", 5), ("abc", 5)]


def test_shingle_basic():
    f = shingle_filter(2)
    toks = tokenize("quick brown fox")
    assert f(toks) == [("quick brown", 0), ("brown fox", 1)]


def test_shingle_respects_stopword_gap():
    # "the" removed at pos 0 → no shingle spans the gap start
    toks = tokenize("the quick brown")  # [(quick,1),(brown,2)]
    assert shingle_filter(2)(toks) == [("quick brown", 1)]
    # interior gap: "quick the fox" → positions 0,2: no adjacent pair
    toks = tokenize("quick the fox")
    assert shingle_filter(2)(toks) == []


def test_length_filter():
    assert length_filter(2, 4)([("a", 0), ("ab", 1), ("abcde", 2)]) == [("ab", 1)]


def test_ascii_folding():
    assert ascii_folding_filter()([("café", 0), ("naïve", 1)]) == [("cafe", 0), ("naive", 1)]


# Porter 1980 published example vectors
PORTER_VECTORS = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"), ("caress", "caress"),
    ("cats", "cat"), ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"), ("conflated", "conflat"),
    ("troubled", "troubl"), ("sized", "size"), ("hopping", "hop"), ("tanned", "tan"),
    ("falling", "fall"), ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"), ("happy", "happi"), ("sky", "sky"), ("relational", "relat"),
    ("conditional", "condit"), ("rational", "ration"), ("valenci", "valenc"),
    ("digitizer", "digit"), ("conformabli", "conform"), ("radicalli", "radic"),
    ("differentli", "differ"), ("vileli", "vile"), ("analogousli", "analog"),
    ("vietnamization", "vietnam"), ("predication", "predic"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"), ("hopefulness", "hope"),
    ("callousness", "callous"), ("formaliti", "formal"), ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"), ("triplicate", "triplic"), ("formative", "form"),
    ("formalize", "formal"), ("electriciti", "electr"), ("electrical", "electr"),
    ("hopeful", "hope"), ("goodness", "good"), ("revival", "reviv"),
    ("allowance", "allow"), ("inference", "infer"), ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"), ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"), ("adjustment", "adjust"),
    ("dependent", "depend"), ("adoption", "adopt"), ("homologou", "homolog"),
    ("communism", "commun"), ("activate", "activ"), ("angulariti", "angular"),
    ("homologous", "homolog"), ("effective", "effect"), ("bowdlerize", "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
]


def test_porter_vectors():
    bad = [(w, porter_stem(w), exp) for w, exp in PORTER_VECTORS if porter_stem(w) != exp]
    assert not bad, bad


def test_keyword_marker_protects():
    f = keyword_marker(frozenset({"running"}), porter_stem_filter())
    assert f([("running", 0), ("jumping", 1)]) == [("running", 0), ("jump", 1)]


def test_chain_composition():
    f = chain(stop_filter(frozenset({"x"})), edge_ngram_filter(1, 2))
    assert f([("x", 0), ("ab", 1)]) == [("a", 1), ("ab", 1)]


def test_synonym_filter():
    from lucene_solr_ray.analysis.extras import synonym_filter

    f = synonym_filter({"quick": ["fast", "rapid"]})
    toks = tokenize("the quick fox")
    assert f(toks) == [("quick", 1), ("fast", 1), ("rapid", 1), ("fox", 2)]
    g = synonym_filter({"quick": ["fast"]}, keep_original=False)
    assert g(toks) == [("fast", 1), ("fox", 2)]
    # stacked positions: a phrase over either variant matches
    assert [p for _, p in f(toks)][:3] == [1, 1, 1]


def test_word_delimiter():
    from lucene_solr_ray.analysis.extras import word_delimiter_filter

    f = word_delimiter_filter()
    assert f([("wi-fi2", 3)]) == [("wi", 3), ("fi", 3), ("2", 3)]
    assert f([("WiFi", 0)]) == [("Wi", 0), ("Fi", 0)]
    assert f([("plain", 1)]) == [("plain", 1)]
    g = word_delimiter_filter(catenate_all=True, preserve_original=True)
    assert g([("wi-fi", 0)]) == [("wi-fi", 0), ("wi", 0), ("fi", 0), ("wifi", 0)]
    h = word_delimiter_filter(generate_parts=False, catenate_all=True)
    assert h([("w00042", 0)]) == [("w00042", 0)]  # caten only when multi-part... parts=('w','00042')
