"""Structural HTML parity vs the recorded reference fastp.html goldens.

The HTML is a human report, not a byte-stable artifact (ours embeds the
same Plotly-based sections with different framing), so parity is checked
on extracted facts: every summary-table key/value row and every Plotly
curve's numeric y-series must match the reference's values.
"""
import os
import re

import pytest

from test_parity import R1, R2, GOLDEN, run_cli

pytestmark = pytest.mark.skipif(not os.path.exists(R1),
                                reason="reference testdata not available")

# rows whose values legitimately differ between the two programs
_SKIP_KEYS = {"fastp version:"}


def summary_rows(html: str) -> dict:
    rows = re.findall(r"<td class='col1'>([^<]*)</td><td class='col2'>([^<]*)</td>", html)
    return {k: v for k, v in rows if k not in _SKIP_KEYS}


def curve_sets(html: str):
    """All Plotly y-series as rounded float tuples, as a multiset."""
    out = {}
    for m in re.finditer(r"y:\[([-0-9.,eEna+]*)\]", html):
        vals = []
        for tok in m.group(1).split(","):
            if not tok:
                continue
            try:
                vals.append(round(float(tok), 4))
            except ValueError:
                vals.append(tok)
        key = tuple(vals)
        out[key] = out.get(key, 0) + 1
    return out


def check_html(tmpdir, golden_name):
    with open(os.path.join(GOLDEN, golden_name, "fastp.html")) as f:
        want = f.read()
    with open(os.path.join(str(tmpdir), "fastp.html")) as f:
        got = f.read()
    wrows = summary_rows(want)
    grows = summary_rows(got)
    for k, v in wrows.items():
        assert k in grows, "missing summary row %r" % k
        assert grows[k] == v, "summary row %r: got %r want %r" % (k, grows[k], v)
    wcurves = curve_sets(want)
    gcurves = curve_sets(got)
    for series, n in wcurves.items():
        assert gcurves.get(series, 0) >= n, \
            "missing curve series (len %d, first %r...)" % (len(series), series[:3])


def test_cfg1_html(tmp_path):
    run_cli(tmp_path, ["-i", R1, "-o", "out.fq"])
    check_html(tmp_path, "cfg1_se_default")


def test_cfg3_html(tmp_path):
    run_cli(tmp_path, ["-i", R1, "-I", R2, "-o", "out1.fq", "-O", "out2.fq",
                       "--correction", "--cut_right"])
    check_html(tmp_path, "cfg3_pe_correction")


def test_cfg5_html(tmp_path):
    run_cli(tmp_path, ["-i", R1, "-I", R2, "--merge", "--merged_out", "merged.fq",
                       "--out1", "out1.fq", "--out2", "out2.fq", "--dedup",
                       "--dup_calc_accuracy", "1", "--overrepresentation_analysis"])
    check_html(tmp_path, "cfg5_merge")


def test_long_read_html_log_axis(tmp_path):
    # >300-cycle reads switch the curve plots to a log x-axis with
    # geometric cycle downsampling (reference: src/stats.cpp:761-804)
    import random
    random.seed(7)
    fq = tmp_path / "long.fq"
    with open(fq, "w") as f:
        for i in range(40):
            seq = "".join(random.choice("ACGT") for _ in range(420))
            f.write("@r%d\n%s\n+\n%s\n" % (i, seq, "F" * 420))
    run_cli(tmp_path, ["-i", str(fq), "-o", "out.fq"])
    with open(tmp_path / "fastp.html") as f:
        html = f.read()
    assert ",type:'log'" in html
    # downsampled x grid: first 40 cycles dense, then geometric; far fewer
    # points than 420
    m = re.search(r"x:\[([0-9,]+)\],y:", html)
    xs = m.group(1).split(",")
    assert len(xs) < 120 and xs[-1] == "420"
