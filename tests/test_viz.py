"""Visualizer HTML generation: self-contained, valid embedded data."""

import json
import re


def test_generate_html(tmp_path):
    from naturaldiffusion_tpu.viz.visualize import generate_coeff_matrix_html
    p = generate_coeff_matrix_html(str(tmp_path / "viz.html"),
                                   algs=["ddim", "flow_euler"], max_rows=24)
    html = open(p).read()
    assert "<canvas" in html and "select id=\"alg\"" in html
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    data = json.loads(m.group(1))
    assert set(data) == {"ddim", "flow_euler"}
    entry = data["ddim"]["18"]
    assert len(entry["x0"]) == 18 and len(entry["x0"][0]) == 18
    assert len(entry["eps"][0]) == 19 and len(entry["node"]) == 19
    # offline: no external resources
    assert "http://" not in html and "https://" not in html.replace(
        "https://docs", "")
