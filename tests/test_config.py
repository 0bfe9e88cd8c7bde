"""Config layer tests — mirrors the reference's config tests
(reference: pkg/config/config_test.go:13-43)."""

import pytest

from klepto_spark.config import Spec, load_spec, write_sample, SAMPLE_SPEC

TOML = """
[Matchers]
  ActiveUsers = "users.active = TRUE"

[[Tables]]
  Name = "users"
  [Tables.Filter]
    Match = "ActiveUsers"
    Limit = 100
    [Tables.Filter.Sorts]
      "created_at" = "desc"
      "id" = "asc"
  [Tables.Anonymise]
    email = "EmailAddress"
    password = "literal:1234"

[[Tables]]
  Name = "orders"
  [[Tables.Relationships]]
    ForeignKey = "user_id"
    ReferencedTable = "users"
    ReferencedKey = "id"

[[Tables]]
  Name = "logs"
  IgnoreData = true
"""


def test_load_and_matcher_substitution():
    spec = load_spec(text=TOML)
    users = spec.find_table("users")
    assert users.filter.match == "users.active = TRUE"  # alias resolved
    assert users.filter.limit == 100
    # ordered multi-key sorts (fixes reference's map nondeterminism)
    assert users.filter.sorts == [("created_at", "desc"), ("id", "asc")]
    assert users.anonymise == {"email": "EmailAddress", "password": "literal:1234"}


def test_matcher_case_insensitive_fallback():
    spec = Spec(matchers={"ActiveUsers": "x = 1"})
    assert spec.resolve_matcher("activeusers") == "x = 1"
    assert spec.resolve_matcher("no_such") == "no_such"
    assert spec.resolve_matcher("") == ""


def test_relationships_and_ignore_data():
    spec = load_spec(text=TOML)
    orders = spec.find_table("orders")
    assert orders.relationships[0].referenced_table == "users"
    assert orders.relationships[0].table == ""  # defaults to scanned table
    assert spec.find_table("logs").ignore_data is True


def test_unknown_anonymiser_fails_at_load():
    bad = TOML.replace("EmailAddress", "NoSuchFaker")
    with pytest.raises(ValueError, match="NoSuchFaker"):
        load_spec(text=bad)


def test_invalid_sort_direction():
    with pytest.raises(ValueError):
        load_spec(text=TOML.replace('"desc"', '"sideways"'))


def test_write_sample_refuses_overwrite(tmp_path):
    p = tmp_path / ".klepto.toml"
    write_sample(p)
    assert p.read_text() == SAMPLE_SPEC
    with pytest.raises(FileExistsError):
        write_sample(p)
    load_spec(p)  # sample must itself parse


def test_locale_and_cast_policy_from_toml():
    spec = load_spec(text=(
        'Locale = "de"\n'
        '[[Tables]]\n  Name = "users"\n  CastPolicy = "keep"\n'))
    assert spec.locale == "de"
    assert spec.tables[0].cast_policy == "keep"
    import pytest
    with pytest.raises(ValueError, match="unknown Locale"):
        load_spec(text='Locale = "zz"\n')
    with pytest.raises(ValueError, match="invalid cast_policy"):
        load_spec(text='[[Tables]]\n  Name = "t"\n  CastPolicy = "x"\n')
