"""Version-range matcher tests (depversion analog — semantics checked
against the published semver/node-range rules, mirroring the shape of
/root/reference/pkg/misc/depversion/depversion_test.go)."""

from guacray.functions.versions import (parse_version, range_includes,
                                        which_versions_match)


def test_parse_and_order():
    a, b = parse_version("1.2.3"), parse_version("1.2.10")
    assert a < b
    assert parse_version("1.2.3-alpha") < parse_version("1.2.3")
    assert parse_version("1.2.3-alpha.1") < parse_version("1.2.3-alpha.2")
    assert parse_version("v2.0.0") == parse_version("2.0.0")
    assert parse_version("1.x") is None  # wildcard is range syntax


def test_comparators():
    assert range_includes(">=1.2.3", "1.2.3")
    assert not range_includes(">1.2.3", "1.2.3")
    assert range_includes("<2.0.0", "1.999.999")
    assert not range_includes("<2.0.0", "2.0.0")
    assert range_includes("=1.2.3", "1.2.3")
    assert range_includes(">=1.0.0 <2.0.0", "1.5.0")      # AND
    assert not range_includes(">=1.0.0 <2.0.0", "2.1.0")
    assert range_includes("<1.0.0 || >=2.0.0", "2.5.0")   # OR


def test_caret_tilde_wildcard_hyphen():
    assert range_includes("^1.2.3", "1.9.9")
    assert not range_includes("^1.2.3", "2.0.0")
    assert range_includes("^0.2.3", "0.2.9")
    assert not range_includes("^0.2.3", "0.3.0")
    assert range_includes("~1.2.3", "1.2.9")
    assert not range_includes("~1.2.3", "1.3.0")
    assert range_includes("1.2.x", "1.2.7")
    assert not range_includes("1.2.x", "1.3.0")
    assert range_includes("1.2.3 - 2.3.4", "2.0.0")
    assert not range_includes("1.2.3 - 2.3.4", "2.3.5")
    assert range_includes("*", "0.0.1")


def test_which_versions_match():
    vs = ["1.0.0", "1.2.0", "1.2.5", "2.0.0", "2.1.0", "bogus"]
    assert which_versions_match(vs, "^1.2.0") == ["1.2.0", "1.2.5"]
    assert which_versions_match(vs, ">=2.0.0") == ["2.0.0", "2.1.0"]
    assert which_versions_match(vs, "*") == vs[:-1]
