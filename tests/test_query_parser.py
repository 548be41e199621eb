from lucene_solr_ray.search.query import parse_query


def test_single_term():
    n = parse_query("Bash")
    assert n.kind == "term" and n.terms == ["bash"]


def test_default_or():
    n = parse_query("foo bar")
    assert n.kind == "bool"
    assert [occ for occ, _ in n.clauses] == ["SHOULD", "SHOULD"]


def test_must_and_not():
    n = parse_query("+foo -bar baz")
    occs = [occ for occ, _ in n.clauses]
    assert occs == ["MUST", "MUST_NOT", "SHOULD"]


def test_phrase():
    n = parse_query('"tool output bash"')
    assert n.kind == "phrase" and n.terms == ["tool", "output", "bash"]


def test_single_word_phrase_is_term():
    assert parse_query('"bash"').kind == "term"


def test_stopword_only_query_is_none():
    assert parse_query("the of and") is None
    assert parse_query("") is None


def test_pure_negation_is_none():
    assert parse_query("-foo -bar") is None


def test_stopword_clause_dropped():
    n = parse_query("the bash")
    assert n.kind == "term" and n.terms == ["bash"]


def test_all_terms():
    n = parse_query('+foo "a b cc" -dd ee')
    assert sorted(n.all_terms()) == ["b", "cc", "dd", "ee", "foo"]
