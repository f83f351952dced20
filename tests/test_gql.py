"""Unit tests for the GQL lexer/parser and the model codecs.

Covers the grammar productions of libgdp/gdp-parse.c and the codec
constants of libgraph (GUIDs, graph timestamps), including the
reference behaviors called out in review: bottom-up constraint
completion, '|' vs '||', '(: :)' comments, malformed-GUID errors, and
the numeric timestamp forms of graph-timestamp.c:123-260.
"""

from __future__ import annotations

import pytest

from graphd_spark.gql import lexer as L
from graphd_spark.gql.parser import ParseError, Parser, parse_request
from graphd_spark import model


def parse(text: str):
    return parse_request(text)


# --- lexer ---------------------------------------------------------------


def test_lexer_basic_tokens():
    toks = L.tokenize('read (value~="a*" left->() $x=name)')
    kinds = [t.kind for t in toks]
    assert kinds == [
        L.ATOM, L.OPAR, L.ATOM, L.FE, L.STR, L.ATOM, L.RARR, L.OPAR,
        L.CPAR, L.VAR, L.EQ, L.ATOM, L.CPAR, L.END,
    ]


def test_lexer_comment_skipped():
    # '(: ... :)' is a comment (ref gdp-lexer.c consume_comments_and_space)
    toks = L.tokenize('read (: this is (a) comment :) (name="x")')
    texts = [t.text for t in toks if t.kind != L.END]
    assert texts == ["read", "(", "name", "=", "x", ")"]


def test_lexer_comment_with_colon_inside():
    toks = L.tokenize("(: a : b :)(")
    assert [t.kind for t in toks] == [L.OPAR, L.END]


def test_lexer_unterminated_comment():
    with pytest.raises(L.LexError):
        L.tokenize("read (: never closed")


def test_lexer_string_escapes():
    toks = L.tokenize(r'"a\"b\\c\nd"')
    assert toks[0].text == 'a"b\\c\nd'


def test_lexer_atom_trailing_dash_put_back():
    toks = L.tokenize("foo-bar- stuff")
    assert toks[0].text == "foo-bar"
    assert toks[1].kind == L.MINUS


# --- parser: clauses -----------------------------------------------------


def test_parse_simple_value_read():
    req = parse('read (value="foo")')
    con = req.constraint
    assert con.value_strcons[0].op == "="
    assert con.value_strcons[0].values == ["foo"]
    assert con.live == "true"  # default
    assert con.count_min is None  # unconstrained (compiler defaults to 1)


def test_parse_value_set():
    req = parse('read (value=("a" "b" null))')
    assert req.constraint.value_strcons[0].values == ["a", "b", None]


def test_parse_bare_string_is_type():
    req = parse('read ("Person" name="bob")')
    con = req.constraint
    assert con.type_strcons[0].values == ["Person"]
    assert con.name_strcons[0].values == ["bob"]


def test_parse_guid_and_linkages():
    g = "0123456789abcdef0123456789abcdef"
    req = parse(f"read (guid={g} left=null right!=({g}))")
    con = req.constraint
    assert con.guid[0].guids == [g]
    assert con.links["left"][0].guids == [None]
    assert con.links["right"][0].op == "!="


def test_parse_bad_guid_is_parse_error():
    with pytest.raises(ParseError):
        parse("read (guid=xyz)")


def test_parse_sub_linkage_arrow():
    req = parse('read (left->(name="n"))')
    sub = req.constraint.subs[0]
    assert sub.linkage == ("iam", "left")  # parent.left == sub.guid


def test_parse_left_arrow_linkage():
    req = parse('read ((<-left name="n"))')
    sub = req.constraint.subs[0]
    assert sub.linkage == ("my", "left")  # sub.left == parent.guid


def test_nested_meta_arrows_child_claims_first():
    # post-order completion (ref graphd-ast.c: subcons complete before
    # the parent): the inner '<-' must claim ('my','right') before the
    # outer '->' tries to hand it ('iam','right').
    req = parse('read (-> (<- (value="x")))')
    outer = req.constraint
    mid = outer.subs[0]
    inner = mid.subs[0]
    assert mid.meta == "to"
    assert mid.linkage == ("my", "right")
    assert inner.linkage == ("iam", "left")


def test_meta_arrow_assigns_free_child():
    req = parse('read (-> (name="n"))')
    sub = req.constraint.subs[0]
    assert sub.linkage == ("iam", "right")


def test_or_chain_and_short_circuit_flags():
    req = parse('read (value="a" | value="b" || value="c")')
    chain = req.constraint.or_chains[0]
    assert len(chain) == 3
    assert chain[0].or_short_circuit is False
    assert chain[1].or_short_circuit is False  # joined with '|'
    assert chain[2].or_short_circuit is True  # joined with '||'


def test_count_operators():
    con = parse("read ((<-left count>=2 count<=5))").constraint.subs[0]
    assert con.count_min == 2
    assert con.count_max == 5
    con = parse("read ((<-left count=0))").constraint.subs[0]
    assert con.count_eq == 0


def test_optional_is_count_min_zero():
    con = parse("read ((<-left optional))").constraint.subs[0]
    assert con.count_min == 0
    assert con.is_optional


def test_unlinked_sub_is_error():
    with pytest.raises(ParseError, match="unknown subconstraint linkage"):
        parse('read (name="x" (value="y"))')


def test_sort_and_result_patterns():
    req = parse("read (sort=(-value name) result=((guid value)))")
    con = req.constraint
    assert [k.descending for k in con.sort] == [True, False]
    assert con.result.kind == "list"
    assert [p.kind for p in con.result.children[0].children] == [
        "guid",
        "value",
    ]


def test_timestamp_constraint():
    con = parse("read (timestamp>=2005-02 timestamp<2006)").constraint
    assert [t.op for t in con.timestamps] == [">=", "<"]


def test_generation_constraints():
    con = parse("read (newest>=1 oldest=0)").constraint
    assert {(g.field, g.op, g.n) for g in con.gens} == {
        ("newest", ">=", 1),
        ("oldest", "=", 0),
    }


def test_modifiers():
    req = parse('read id="q1" asof="2005-01-01" (name="x")')
    assert req.modifiers["id"] == "q1"
    assert req.modifiers["asof"] == "2005-01-01"


def test_variables():
    req = parse("read ($v=value sort=($v))")
    con = req.constraint
    assert con.assignments[0][0] == "$v"
    # same-level variables are substituted (ref variable-analysis):
    # sort=($v) with $v=value compiles as sort=value
    assert con.sort[0].pattern.kind == "value"


def test_variable_errors():
    with pytest.raises(ParseError, match="circular"):
        parse("read ($v=$v)")
    with pytest.raises(ParseError, match="assigned to twice"):
        parse("read ($v=value $v=name)")
    with pytest.raises(ParseError, match="not set"):
        parse("read (result=($q))")


def test_cross_level_variable_not_substituted():
    req = parse('read (result=(($x)) (<-left $x=value))')
    con = req.constraint
    pats = [p.kind for p in con.result.walk()]
    assert "variable" in pats  # resolved from the child at runtime


def test_write_unique_key():
    req = parse('write (unique=(value left) value="x" left->(anchor))')
    con = req.constraint
    assert con.unique == ["value", "left"]
    assert con.subs[0].anchor


# --- model codecs --------------------------------------------------------


def test_guid_codec_roundtrip_predictable():
    g = model.guid_compose(model.PREDICTABLE_DB_ID, 9)
    assert g == "00000012400034568000000000000009"
    assert model.guid_serial(g) == 9
    assert model.guid_db(g) == model.PREDICTABLE_DB_ID


def test_ts_predictable_rendering():
    ts = model.ts_predictable(3)
    assert model.ts_to_string(ts) == "1970-01-01T00:00:00.0003Z"


def test_ts_from_string_full():
    ts = model.ts_from_string("2005-02-21T23:00:55.0007Z")
    assert model.ts_to_string(ts) == "2005-02-21T23:00:55.0007Z"


def test_ts_from_string_compact_datetime():
    # dashless YYYYMMDDHHMMSS (ref graph-timestamp.c:195-225)
    assert model.ts_from_string("20050221230055") == model.ts_from_string(
        "2005-02-21T23:00:55"
    )


def test_ts_from_string_epoch_seconds():
    ts = model.ts_from_string("1109026855")
    assert (ts >> 16) == 1109026855


def test_ts_from_string_short_year():
    # 2-digit years < 50 get +2000, 3-digit < 150 get +1900
    assert model.ts_from_string("05-03-01") == model.ts_from_string(
        "2005-03-01"
    )
    assert model.ts_from_string("99-01-01") == model.ts_from_string(
        "1999-01-01"
    )


def test_ts_from_string_space_separator():
    assert model.ts_from_string("2005-02-21 23:00:55") == model.ts_from_string(
        "2005-02-21T23:00:55"
    )


def test_ts_from_string_partial_round_up():
    hi = model.ts_from_string("2005-02", round_up=True)
    assert model.ts_to_string(hi) == "2005-02-28T23:59:59.65535Z"[:20] + (
        "%04d" % 0xFFFF
    ) + "Z"


def test_ts_from_string_rejects_garbage():
    for bad in ("hello", "2005-xx", "123456-01"):
        with pytest.raises(ValueError):
            model.ts_from_string(bad)


def test_xx_decode_strict_hex():
    """pdb_xx_decode (libpdb/pdb-util.c:70) requires two strict hex
    digits after %: '+f'/' f' are syntax errors, not int()-lenient
    escapes; a trailing bare % passes through literally."""
    from graphd_spark.cursor import BadCursor, _xx_decode

    assert _xx_decode("a%20b") == "a b"
    assert _xx_decode("%2F%2f") == "//"
    assert _xx_decode("tail%2") == "tail%2"  # <2 chars left: literal
    assert _xx_decode("tail%") == "tail%"
    for bad in ("%+f", "% f", "%g0", "%0g", "%-1"):
        import pytest as _pytest

        with _pytest.raises(BadCursor):
            _xx_decode(bad)


def test_nested_chain_subs_served(spark):
    """Sub-bearing BARE nested or-chains serve since round 8: the
    parse-level flatten splices a bare ``{...}`` chain branch into
    the enclosing chain (the reference's own normalization, probed
    byte-identical incl. cursor checksums —
    test_differential.test_nested_chain_flatten pins the full
    matrix).  This flipped from the round-7 refusal test; the one
    or-family still refused loudly is a branch CONJOINING a nested
    chain with its own subs/assignments."""
    from graphd_spark.api import GraphSession

    gs = GraphSession(spark)
    gs.request('write (value="p0" (<-left value="k1"))')
    r = gs.request(
        'read (value="p0" { value="x" | { (<-left value="k1") | '
        'name="y" } } result=((value)))'
    )
    assert r == 'ok (("p0"))', r
    # round 9 lifted the last refusal: a branch CONJOINING a
    # sub-bearing nested chain with its own clauses serves via the
    # recursive first-match machinery (_branch_flag; probed
    # byte-identical, tests/test_differential.py inner-sub matrix)
    r2 = gs.request(
        'read ({ { (<-left value="k1") | name="y" } value="p0" } '
        '| { value="zz" } result=((value)))'
    )
    assert r2 == 'ok (("p0"))', r2
