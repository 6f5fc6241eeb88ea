"""Masking / tokenization / template-regex kernel tests (SURVEY.md O8-O13,
O20). Includes property test 3b: param-extraction round-trip regenerates
the original line byte-for-byte — the byte-identity invariant itself."""

import re

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ai_log_analyzer_spark import grammar, masking


def test_mask_ip_num_hex():
    line = "Connection from 10.0.0.1 port 8080 closed with 0xdeadbeef"
    out = masking.mask_line(line)
    assert out == "Connection from <:IP:> port <:NUM:> closed with <:HEX:>"


def test_mask_order_ip_before_num():
    assert masking.mask_line("1.2.3.4") == "<:IP:>"
    assert masking.mask_line("1234") == "<:NUM:>"
    assert masking.mask_line("12.5") == "<:NUM:>"


def test_mask_embedded_ip_port():
    assert masking.mask_line("to 1.2.3.4:80 ok") == "to <:IP:>:<:NUM:> ok"


def test_identifier_digits_not_masked():
    # blk_123 / eth0: digits glued to word chars stay literal
    assert masking.mask_line("blk_123") == "blk_123"
    assert masking.mask_line("eth0 up") == "eth0 up"


def test_tokenize_collapses_whitespace():
    assert masking.tokenize("a  b\tc") == ["a", "b", "c"]


def test_template_regex_embedded_masks():
    toks = ["to", "<:IP:>:<:NUM:>", "ok"]
    rx = re.compile(masking.template_regex(toks))
    m = rx.match("to 1.2.3.4:80 ok")
    assert m and list(m.groups()) == ["1.2.3.4", "80"]
    assert masking.param_mask_names(toks) == ["IP", "NUM"]


def test_template_regex_wildcard():
    toks = ["User", "<*>", "logged", "in"]
    rx = re.compile(masking.template_regex(toks))
    assert rx.match("User alice logged in").group(1) == "alice"
    assert rx.match("User alice bob logged in") is None  # one token only


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=10**9))
def test_roundtrip_property_rendered_lines(seed):
    """Property 3b: for any grammar-rendered line, masking → template →
    extraction → substitution is the identity, byte-for-byte."""
    import numpy as np
    rng = np.random.default_rng(seed)
    tmpl = grammar.TEMPLATES[int(rng.integers(0, len(grammar.TEMPLATES)))]
    line, _params = grammar._render(tmpl, rng)
    masked = masking.mask_line(line)
    tokens = masking.tokenize(masked)
    rx = re.compile(masking.template_regex(tokens))
    got = masking.extract_params(rx, line)
    assert got is not None, (line, masked)
    assert masking.substitute(tokens, got) == line


def test_single_pass_equals_multipass_hypothesis():
    """The single-pass alternation kernel must byte-match the sequential
    per-instruction rewrite on adversarial inputs (digits, dots, 0x
    prefixes, mask-like text, unicode)."""
    from hypothesis import given, settings, strategies as st

    from ai_log_analyzer_spark import masking

    alphabet = st.sampled_from(
        list("0123456789abcdefx. :<>_-/") + ["0x", "1.2.3.4", "<:NUM:>",
                                             "..", "99", "f", "G", "\t", "é"])
    texts = st.lists(alphabet, min_size=0, max_size=30).map("".join)

    @settings(max_examples=2000, deadline=None)
    @given(texts)
    def check(s):
        assert masking.mask_line(s) == masking.mask_line_multipass(s), repr(s)

    check()
