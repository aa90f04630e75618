"""Template-level object filters — golden ports of the reference
doctest cases (src/updater/tera_helpers/filters/object.rs)."""

from __future__ import annotations

import json

import pytest

from chewdata_spark.functions.objects import (
    value_extract,
    value_keys,
    value_merge,
    value_replace_key,
    value_replace_value,
    value_search,
    value_update,
    value_values,
)

# -- value-level golden cases (exact reference doctests) ---------------------


def test_search_doctest():
    # object.rs:98-111
    v = {"field_1": {"field_2": "value"}}
    assert value_search(v, "/field_1") == {"field_2": "value"}
    assert value_search(v, "field_1.field_2") == "value"
    assert value_search(v, "/missing") is None


def test_replace_key_doctest():
    # object.rs:124-140: from='^(field_1)$', to='@$1'
    v = {"field_1": "value_1", "field_2": "value_1"}
    out = value_replace_key(v, "^(field_1)$", "@$1")
    assert out == {"@field_1": "value_1", "field_2": "value_1"}


def test_replace_key_level_caps_depth():
    v = {"a": {"a": "x"}}
    assert value_replace_key(v, "^a$", "b", level=1) == {"b": {"a": "x"}}
    assert value_replace_key(v, "^a$", "b") == {"b": {"b": "x"}}


def test_replace_value_doctest():
    # object.rs:224-247: from='^(value_1)$', to='@$1'
    v = {"field_1": "value_1", "field_2": "value_1"}
    out = value_replace_value(v, "^(value_1)$", "@$1")
    assert out == {"field_1": "@value_1", "field_2": "@value_1"}


def test_replace_value_retypes_via_resolve():
    assert value_replace_value({"n": "x"}, "^x$", "42") == {"n": 42}
    assert value_replace_value({"b": "y"}, "^y$", "true") == {"b": True}
    assert value_replace_value({"n": 30}, "^30$", "31") == {"n": 31}


def test_extract_doctest():
    # object.rs:305-330: array of objects, attributes=['field1_1.field1_2']
    v = [{"field1_1": {"field1_2": "value1_1"}}, {"field2_1": {"field2_2": "value2_1"}}]
    out = value_extract(v, ["field1_1.field1_2"])
    assert out == [{"field1_1": {"field1_2": "value1_1"}}]


def test_merge_doctests():
    # object.rs:12-50
    assert value_merge(["a"], ["b"]) == ["a", "b"]
    assert value_merge({"a": "b"}, {"c": "d"}, "e") == {"a": "b", "e": {"c": "d"}}
    assert value_merge({"a": {"x": 1}}, {"a": {"y": 2}}) == {"a": {"x": 1, "y": 2}}


def test_update_doctest():
    # object.rs:380-395: fn=filter at attribute=roles
    v = {
        "name": "  Alice  ",
        "age": 30,
        "roles": [
            {"name": " Admin ", "code": "admin"},
            {"name": " Other ", "code": "other"},
        ],
    }
    out = value_update(
        v,
        {"fn": "filter", "filter_attribute": "code", "filter_value": "admin",
         "attribute": "roles"},
    )
    assert out == {
        "name": "  Alice  ",
        "age": 30,
        "roles": [{"name": " Admin ", "code": "admin"}],
    }


def test_update_wildcard_and_regex_paths():
    v = {"items": [{"name": " a "}, {"name": " b "}]}
    out = value_update(v, {"fn": "trim", "attribute": "items.*.name"})
    assert out == {"items": [{"name": "a"}, {"name": "b"}]}
    # regex key match (first matching key, like the reference)
    v2 = {"aa": " x ", "ab": " y "}
    assert value_update(v2, {"fn": "trim", "attribute": "a."}) == {"aa": "x", "ab": " y "}


def test_update_rejects_recursion_and_missing():
    with pytest.raises(ValueError):
        value_update({}, {"fn": "update", "attribute": "a"})
    with pytest.raises(ValueError):
        value_update({"a": 1}, {"fn": "trim", "attribute": "nope"})


def test_keys_values_doctests():
    # object.rs:520-552
    assert value_keys({"a": 1, "b": 2}) == ["a", "b"]
    assert value_keys(["x", "y"]) == [0, 1]
    assert value_keys("scalar") is None
    assert value_values({"a": 1, "b": 2}) == [1, 2]
    assert value_values(["x"]) == ["x"]


# -- compiled into {{ ... }} patterns ----------------------------------------


@pytest.fixture(scope="module")
def people(spark):
    data = [
        (1, "  Alice  ", 30, [{"name": " Admin ", "code": "admin"},
                              {"name": " Other ", "code": "other"}]),
        (2, "Bob", 41, [{"name": " User ", "code": "user"}]),
    ]
    return spark.createDataFrame(
        data,
        "id int, name string, age int, roles array<struct<name:string,code:string>>",
    )


def _apply(df, pattern, field="out"):
    from chewdata_spark.operators.transformer import Action, apply_actions

    return apply_actions(df, [Action(field, pattern)])


def test_template_update_filter(spark, people):
    df = _apply(
        people,
        "{{ input | update(fn='filter', filter_attribute='code', "
        "filter_value='admin', attribute='roles') }}",
    )
    rows = {r.id: r.out for r in df.collect()}
    assert json.loads(rows[1])["roles"] == [{"name": " Admin ", "code": "admin"}]
    assert json.loads(rows[2])["roles"] == []


def test_template_replace_key_chain(spark, people):
    df = _apply(people, "{{ input | replace_key(from='^name$', to='label') }}")
    out = json.loads(df.collect()[0].out)
    assert "label" in out and "name" not in out
    # nested keys inside roles renamed too
    assert all("label" in r for r in out["roles"])


def test_template_replace_value(spark, people):
    df = _apply(people, "{{ input | replace_value(from='^Bob$', to='Robert') }}")
    outs = [json.loads(r.out) for r in df.collect()]
    assert any(o["name"] == "Robert" for o in outs)


def test_template_extract(spark, people):
    df = _apply(people, "{{ input | extract(attributes=['id', 'name']) }}")
    out = json.loads(df.filter("id = 2").collect()[0].out)
    assert out == {"id": 2, "name": "Bob"}


def test_template_search_keys_values(spark, people):
    df = _apply(people, "{{ input | search(attribute='/roles/0/code') }}", field="code0")
    assert {r.code0 for r in df.collect()} == {"admin", "user"}

    df2 = _apply(people.select("id", "name"), "{{ input | keys }}", field="ks")
    assert df2.collect()[0].ks == ["id", "name"]

    # keys on an ARRAY = its indices (object.rs:540-552)
    df2a = _apply(people, "{{ input.roles | keys }}", field="ks")
    row = df2a.filter("id = 1").collect()[0]
    assert row.ks == ["0", "1"] or row.ks == ["0"]

    df3 = _apply(people.select("id", "name"), "{{ input | values }}", field="vs")
    row = df3.filter("id = 2").collect()[0]
    # typed values (object.rs:527-537): number stays number
    assert json.loads(row.vs) == [2, "Bob"]


def test_template_merge(spark, people):
    df = _apply(
        people.select("id", "name"),
        '{{ input | merge(with=\'{"tag":"vip"}\') }}',
    )
    out = json.loads(df.collect()[0].out)
    assert out["tag"] == "vip" and "name" in out


def test_template_chained_object_filters(spark, people):
    """JSON-text state is threaded through the chain (to_json once)."""
    df = _apply(
        people,
        "{{ input | extract(attributes=['name','age']) "
        "| replace_key(from='^age$', to='years') }}",
    )
    out = json.loads(df.filter("id = 2").collect()[0].out)
    assert out == {"name": "Bob", "years": 41}


def test_extract_regex_attribute_names():
    """Reference extract accepts regex attribute names
    (object.rs:306 'Accept regular expression in the attribute names')."""
    v = {"field_1": {"x": 1}, "field_2": {"x": 2}, "other": 3}
    out = value_extract(v, [r"field_\d+.x"])
    assert out == {"field_1": {"x": 1}, "field_2": {"x": 2}}
    # exact names still take precedence over regex interpretation
    assert value_extract({"a.b": 1}, ["a.b"]) == {}  # dotted = path, not literal
    assert value_extract({"a": {"b": 7}}, ["a.b"]) == {"a": {"b": 7}}
