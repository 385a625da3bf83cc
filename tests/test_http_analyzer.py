"""Drive the sidecar analyzer UI over real HTTP (app/server.py).

The reference ships the analyzer as a second served web app
(/root/reference/analyser.py:108-157, Streamlit: file analysis with LUFS,
one-click normalization to a target LUFS, and format conversion with a
bitrate knob).  ``python -m audio_raytracing_studio_tpu.app.analyzer_ui``
serves the same two-mode tool on 0.0.0.0:8862 through the headless
runtime's ``launch`` → stdlib server path; these tests bind an ephemeral
port and exercise every mode over the wire with a urllib client —
analyze, normalize (result downloaded and re-metered), convert (result
downloaded and decoded back).
"""

import io
import json
import os
import urllib.error
import urllib.parse
import urllib.request

import numpy as np
import pytest

from audio_raytracing_studio_tpu.app import analyzer_ui
from audio_raytracing_studio_tpu.app.server import StudioHTTPServer
from audio_raytracing_studio_tpu.utils import wavio


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    root = tmp_path_factory.mktemp("analyzer_http")
    old_cwd = os.getcwd()
    os.chdir(root)
    try:
        demo = analyzer_ui.build_demo()
        server = StudioHTTPServer(demo, host="127.0.0.1", port=0).start()
        yield server
        server.stop()
    finally:
        os.chdir(old_cwd)


def _get(server, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}{path}", timeout=120
    ) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def _post_json(server, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}",
        data=json.dumps(payload).encode("utf-8"),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.status, json.loads(r.read())


def _state(server):
    _, _, body = _get(server, "/state")
    return json.loads(body)["components"]


def _by_label(components, label, tab=None):
    matches = [
        c
        for c in components
        if c["label"] == label and (tab is None or c["tab"] == tab)
    ]
    assert matches, f"no component labeled {label!r} (tab={tab!r})"
    return matches[0]


@pytest.fixture(scope="module")
def uploaded(served):
    """One clip uploaded once for the whole module."""
    rate = 16000
    t = np.arange(int(0.8 * rate)) / rate
    x = (0.25 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    buf = io.BytesIO()
    wavio.write(buf, x, rate)
    req = urllib.request.Request(
        f"http://127.0.0.1:{served.port}/upload",
        data=buf.getvalue(),
        headers={"X-Filename": "ana_in.wav"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())["path"]


def test_page_serves_both_modes(served):
    status, ctype, body = _get(served, "/")
    assert status == 200 and ctype.startswith("text/html")
    page = body.decode("utf-8")
    assert "Dateianalyse" in page
    assert "Dateikonvertierung" in page
    assert "Analysieren" in page
    assert "Konvertieren" in page


def test_analyze_over_http(served, uploaded):
    comps = _state(served)
    ana_file = _by_label(comps, "Audiodatei hochladen", tab="📃 Dateianalyse")
    button = _by_label(comps, "Analysieren")
    status, data = _post_json(
        served,
        "/event",
        {
            "id": button["id"],
            "event": "click",
            "set": {str(ana_file["id"]): uploaded},
        },
    )
    assert status == 200
    report = json.loads(_by_label(data["components"], "Analyse")["value"])
    assert report["Abtastrate"] == 16000
    assert report["Kanäle"] == 1
    assert report["Dauer (Sekunden)"] == pytest.approx(0.8, abs=0.01)
    assert report["LUFS"] == pytest.approx(-15.0, abs=4.0)


def test_normalize_over_http(served, uploaded):
    comps = _state(served)
    ana_file = _by_label(comps, "Audiodatei hochladen", tab="📃 Dateianalyse")
    target = _by_label(comps, "Ziel-LUFS")
    button = _by_label(comps, "Auf Ziel-LUFS normalisieren")
    status, data = _post_json(
        served,
        "/event",
        {
            "id": button["id"],
            "event": "click",
            "set": {str(ana_file["id"]): uploaded, str(target["id"]): -20},
        },
    )
    assert status == 200
    out = _by_label(data["components"], "Normalisierte Datei")
    assert out["value"] and out.get("url"), "normalized file not exposed"
    status, ctype, body = _get(served, out["url"])
    assert status == 200 and ctype == "audio/wav"
    sig, rate = wavio.read(io.BytesIO(body))
    from audio_raytracing_studio_tpu.oracle.loudness import (
        calculate_audio_metrics,
    )

    metrics = calculate_audio_metrics(sig, rate)
    # exact static gain: the sidecar contract (cli/analyzer.normalize_to_lufs)
    assert metrics["lufs"] == pytest.approx(-20.0, abs=0.1)
    report = json.loads(_by_label(data["components"], "Bericht")["value"])
    assert report["output_lufs"] == pytest.approx(-20.0, abs=0.1)
    assert report["clipped"] is False


def test_convert_over_http(served, uploaded):
    """Conversion to FLAC (always-native target) round-trips losslessly and
    downloads with the right content type."""
    comps = _state(served)
    conv_file = _by_label(
        comps, "Audiodatei hochladen", tab="🔄 Dateikonvertierung"
    )
    fmt = _by_label(comps, "Zielformat")
    button = _by_label(comps, "Konvertieren")
    status, data = _post_json(
        served,
        "/event",
        {
            "id": button["id"],
            "event": "click",
            "set": {str(conv_file["id"]): uploaded, str(fmt["id"]): "flac"},
        },
    )
    assert status == 200
    out = _by_label(data["components"], "Ergebnis")
    assert out["value"] and out["value"].endswith(".flac")
    assert out.get("url")
    status, ctype, body = _get(served, out["url"])
    assert status == 200 and ctype == "audio/flac"
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".flac", delete=False) as tmp:
        tmp.write(body)
        flac_path = tmp.name
    try:
        sig, rate = wavio.read(flac_path)
    finally:
        os.unlink(flac_path)
    orig, orate = wavio.read(uploaded)
    assert rate == orate
    np.testing.assert_allclose(
        np.squeeze(sig), np.squeeze(orig), atol=2 ** -15
    )


def test_convert_bad_input_surfaces_error_not_500(served):
    """A missing file must come back as the handler's own status string
    (the reference surfaces conversion failures in the UI, not a crash)."""
    comps = _state(served)
    button = _by_label(comps, "Konvertieren")
    conv_file = _by_label(
        comps, "Audiodatei hochladen", tab="🔄 Dateikonvertierung"
    )
    status, data = _post_json(
        served,
        "/event",
        {
            "id": button["id"],
            "event": "click",
            # a component value from an earlier interaction must not leak in
            "set": {str(conv_file["id"]): None},
        },
    )
    assert status == 200
    status_box = _by_label(data["components"], "Status")
    assert status_box["value"] == "Keine Datei."
