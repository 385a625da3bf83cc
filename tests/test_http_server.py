"""Drive the studio over real HTTP (app/server.py) with a urllib client.

Round-3 VERDICT item 1: the flagship web surface must be browser-reachable
in this image, not pytest-only.  These tests bind the stdlib server on an
ephemeral port and exercise the reference Tab-1 flow
(/root/reference/raytracer_studio.py:1326-1330) end-to-end over the wire:
page load, state snapshot, clip upload, process click, result download,
map click → slider update, and a full preset save/load round-trip — plus
the file-endpoint allowlist (no arbitrary reads).
"""

import io
import json
import os
import urllib.error
import urllib.parse
import urllib.request

import numpy as np
import pytest

from audio_raytracing_studio_tpu.app import marker, studio
from audio_raytracing_studio_tpu.app.server import StudioHTTPServer, render_page
from audio_raytracing_studio_tpu.utils import wavio
from audio_raytracing_studio_tpu.utils.presets import PresetStore


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """One live server for the module (startup + bind are not free)."""
    root = tmp_path_factory.mktemp("studio_http")
    old_cwd = os.getcwd()
    os.chdir(root)
    try:
        marker.ensure_map_asset()
        store = PresetStore(str(root))
        demo = studio.build_demo(store)
        server = StudioHTTPServer(demo, host="127.0.0.1", port=0).start()
        yield server, demo, root
        server.stop()
    finally:
        os.chdir(old_cwd)


def _get(server, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{server.port}{path}", timeout=120) as r:
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


def _by_label(components, label):
    matches = [c for c in components if c["label"] == label]
    assert matches, f"no component labeled {label!r}"
    return matches[0]


@pytest.fixture
def clip(tmp_path):
    rate = 16000
    t = np.arange(int(0.6 * rate)) / rate
    x = (0.5 * np.sin(2 * np.pi * 330.0 * t)).astype(np.float32)
    path = tmp_path / "http_in.wav"
    wavio.write(path, x, rate)
    return str(path)


def test_page_serves_tabs_and_controls(served):
    server, demo, _ = served
    status, ctype, body = _get(server, "/")
    assert status == 200 and ctype.startswith("text/html")
    page = body.decode("utf-8")
    for fragment in (
        "Audio-Verarbeitung &amp; Positionierung",
        "Visualizer",
        "Preset-Editor",
        "Hilfe",
        "Verarbeiten &amp; Anhören!",
        "mapClick",  # clickable position map wired
    ):
        assert fragment in page, fragment
    # render_page is deterministic given the blocks
    assert render_page(demo) is not None


def test_state_snapshot(served):
    server, _, _ = served
    status, _, body = _get(server, "/state")
    assert status == 200
    comps = json.loads(body)["components"]
    layout = _by_label(comps, "🎯 Ziel-Layout")
    assert "Stereo" in layout["choices"]
    process = _by_label(comps, "➡️ Verarbeiten & Anhören!")
    assert "click" in process["events"]
    # the startup initializer ran: metrics display shows the ready message
    metrics = _by_label(comps, "📊 Ergebnis-Metriken (Gesamt)")
    assert metrics["value"] == "Bereit. Bitte Audio laden."
    # the map image is downloadable
    image = _by_label(comps, "Karte (Klicken für X/Y)")
    assert image.get("url")
    status, ctype, body = _get(server, image["url"])
    assert status == 200 and ctype == "image/png" and body[:8] == b"\x89PNG\r\n\x1a\n"


def test_upload_process_download(served, clip):
    """The reference Tab-1 flow, over the wire: upload → process → result."""
    server, _, _ = served
    with open(clip, "rb") as fh:
        raw = fh.read()
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/upload",
        data=raw,
        headers={"X-Filename": "clip.wav"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        uploaded = json.loads(r.read())["path"]
    assert os.path.isfile(uploaded)

    comps = _state(server)
    audio_in = _by_label(comps, "🔊 Audio hochladen")
    layout = _by_label(comps, "🎯 Ziel-Layout")
    process = _by_label(comps, "➡️ Verarbeiten & Anhören!")
    status, data = _post_json(
        server,
        "/event",
        {
            "id": process["id"],
            "event": "click",
            "set": {str(audio_in["id"]): uploaded, str(layout["id"]): "Stereo"},
        },
    )
    assert status == 200
    comps = data["components"]
    result = _by_label(comps, "🎧 Ergebnis anhören")
    metrics = _by_label(comps, "📊 Ergebnis-Metriken (Gesamt)")
    assert "LUFS" in metrics["value"]
    assert result["value"] and result.get("url")
    status, ctype, body = _get(server, result["url"])
    assert status == 200 and ctype == "audio/wav"
    out, rate = wavio.read(io.BytesIO(body))
    assert rate == 16000
    assert out.shape[0] > int(0.6 * 16000)  # reverb tail appended
    assert np.max(np.abs(out)) > 1e-4


def test_map_click_updates_sliders(served):
    server, _, _ = served
    comps = _state(server)
    image = _by_label(comps, "Karte (Klicken für X/Y)")
    w, h = marker.MAP_SIZE
    status, data = _post_json(
        server,
        "/event",
        {"id": image["id"], "event": "select", "index": [w // 4, (3 * h) // 4]},
    )
    assert status == 200
    comps = data["components"]
    assert _by_label(comps, "↔️ X (L/R)")["value"] == pytest.approx(0.25, abs=0.01)
    assert _by_label(comps, "↕️ Y (F/B)")["value"] == pytest.approx(0.75, abs=0.01)
    # the marker image re-rendered and is servable
    pos = _by_label(comps, "🎯 Position (X/Y)")
    assert pos.get("url")
    status, _, body = _get(server, pos["url"])
    assert status == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"


def test_preset_roundtrip_over_http(served):
    server, _, _ = served
    comps = _state(server)
    name = _by_label(comps, "📝 Preset-Name")
    save = _by_label(comps, "💾 Speichern")
    bass = _by_label(comps, "Bass Gain")
    status, data = _post_json(
        server,
        "/event",
        {
            "id": save["id"],
            "event": "click",
            "set": {str(name["id"]): "http_preset", str(bass["id"]): 2.5},
        },
    )
    assert status == 200
    comps = data["components"]
    plist = _by_label(comps, "📂 Presets (v4)")
    assert any("http_preset" in c for c in plist["choices"])
    saved = plist["value"]

    # perturb bass, then load the preset back over the wire
    load = _by_label(comps, "📥 Laden")
    status, data = _post_json(
        server,
        "/event",
        {
            "id": load["id"],
            "event": "click",
            "set": {str(bass["id"]): 1.0, str(plist["id"]): saved},
        },
    )
    assert status == 200
    comps = data["components"]
    assert _by_label(comps, "Bass Gain")["value"] == pytest.approx(2.5)
    assert "geladen" in str(_by_label(comps, "Status")["value"])


def test_file_endpoint_is_allowlisted(served):
    server, _, _ = served
    for path in ("/etc/passwd", os.path.abspath(__file__)):
        try:
            status, _, _ = _get(server, "/file?path=" + urllib.parse.quote(path))
        except urllib.error.HTTPError as e:
            status = e.code
        assert status in (403, 404)


def test_set_cannot_plant_servable_path(served):
    """/set and /event must refuse client-set values naming existing files
    that are not already servable — otherwise file_allowed() (which trusts
    component values) would turn /file into an arbitrary filesystem read."""
    server, _, _ = served
    comps = _state(server)
    name = _by_label(comps, "📝 Preset-Name")
    # the /event case needs a REAL listener: route validation now runs
    # before sets are applied, so a bad route is a 400 with no side effects
    refresh = _by_label(comps, "🔄 Liste neu laden")
    secret = "/etc/passwd" if os.path.isfile("/etc/passwd") else os.path.abspath(__file__)

    for payload, path in (
        ({"id": name["id"], "value": secret}, "/set"),
        ({"id": refresh["id"], "event": "click", "set": {str(name["id"]): secret}},
         "/event"),
    ):
        try:
            status, _ = _post_json(server, path, payload)
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 403, f"{path} accepted a foreign file path"

    # the rejected path must NOT have become servable
    try:
        status, _, _ = _get(server, "/file?path=" + urllib.parse.quote(secret))
    except urllib.error.HTTPError as e:
        status = e.code
    assert status in (403, 404)

    # plain strings (preset names etc.) still pass through
    status, data = _post_json(
        server, "/set", {"id": name["id"], "value": "harmless_name"}
    )
    assert status == 200
    assert _by_label(data["components"], "📝 Preset-Name")["value"] == "harmless_name"


def test_textbox_naming_cwd_file_neither_bricks_nor_serves(served):
    """A text value that happens to name an existing RELATIVE file (a preset
    called 'bench.py' while serving from the repo root) must neither 403
    every subsequent event nor make that file servable."""
    server, _, root = served
    (root / "bench.py").write_text("# not actually served\n")
    comps = _state(server)
    name = _by_label(comps, "📝 Preset-Name")
    status, data = _post_json(
        server, "/set", {"id": name["id"], "value": "bench.py"}
    )
    assert status == 200  # the event path keeps working
    assert _by_label(data["components"], "📝 Preset-Name")["value"] == "bench.py"
    # …and the relative component value did NOT join the serving allowlist
    try:
        status, _, _ = _get(server, "/file?path=bench.py")
    except urllib.error.HTTPError as e:
        status = e.code
    assert status in (403, 404)
    try:
        status, _, _ = _get(
            server, "/file?path=" + urllib.parse.quote(str(root / "bench.py"))
        )
    except urllib.error.HTTPError as e:
        status = e.code
    assert status in (403, 404)


def test_rejected_set_applies_nothing(served):
    """A 403'd /event must leave EVERY staged set unapplied — vetting runs
    over the whole dict before any component mutates."""
    server, _, _ = served
    comps = _state(server)
    name = _by_label(comps, "📝 Preset-Name")
    refresh = _by_label(comps, "🔄 Liste neu laden")
    slider = next(c for c in comps if c["type"] == "Slider")
    before = _state(server)
    slider_before = next(c for c in before if c["id"] == slider["id"])["value"]
    secret = os.path.abspath(__file__)
    try:
        status, _ = _post_json(
            server, "/event",
            {"id": refresh["id"], "event": "click",
             "set": {str(slider["id"]): 0.123456,
                     str(name["id"]): secret}},
        )
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 403
    after = _state(server)
    assert next(c for c in after if c["id"] == slider["id"])["value"] == slider_before


def test_preset_delete_cannot_traverse(served):
    """A traversal-shaped preset name posted over the wire must not delete
    files outside presets_v4/.  Two independent layers: the typed /set
    vetting rejects a non-member Dropdown value outright (400, real
    gradio's allow_custom_value=False), and — defense in depth — the
    PresetStore refuses traversal-shaped names even when the handler is
    called directly."""
    server, demo, root = served
    evil = root / "evil.json"
    evil.write_text("{}")
    comps = _state(server)
    plist = _by_label(comps, "📂 Presets (v4)")
    delete = _by_label(comps, "🗑️ Löschen")
    try:
        status, _ = _post_json(
            server,
            "/event",
            {"id": delete["id"], "event": "click",
             "set": {str(plist["id"]): "../evil.json"}},
        )
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400, "non-member dropdown value must be rejected"
    assert evil.exists(), "path traversal deleted a file outside presets_v4/"
    # layer 2: the handler itself (store-level _member_path defense)
    from audio_raytracing_studio_tpu.app.studio import delete_preset
    from audio_raytracing_studio_tpu.utils.presets import PresetStore

    msg, _ = delete_preset(PresetStore(str(root)), "../evil.json")
    assert "nicht gefunden" in msg
    assert evil.exists(), "handler-level traversal deleted an outside file"


def test_handler_keyerror_is_500_not_400(served):
    """KeyErrors raised INSIDE an application handler must surface as
    handler errors (500), not be mistaken for a missing listener (400)."""
    server, demo, _ = served
    from audio_raytracing_studio_tpu.app import _gradio_headless as hl

    with demo:
        probe = hl.Button("KeyError-Probe")
        def _boom():
            raise KeyError("missing-key-inside-handler")
        probe.click(_boom, inputs=[], outputs=[])
    try:
        comp_id = demo.components.index(probe)
        try:
            status, _ = _post_json(server, "/event", {"id": comp_id, "event": "click"})
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 500
    finally:
        demo.components.remove(probe)
        demo._all_deps[:] = [d for d in demo._all_deps if d.trigger is not probe]


def test_file_path_with_nul_byte_is_clean_404(served):
    """os.path.isfile raises ValueError on an embedded NUL — without the
    do_GET guard that was an unclean connection drop plus a stack trace,
    not the error contract."""
    server, _, _ = served
    try:
        status, _, _ = _get(server, "/file?path=%00x")
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 404
    assert _state(server)  # still alive


def test_negative_content_length_is_clean_400(served):
    """A negative Content-Length must never reach rfile.read(-1) — that
    read blocks until the CLIENT closes, pinning a handler thread forever
    on a hostile keep-alive socket."""
    import socket

    server, _, _ = served
    with socket.create_connection(("127.0.0.1", server.port), timeout=30) as s:
        s.sendall(
            b"POST /set HTTP/1.1\r\nHost: x\r\n"
            b"Content-Length: -7\r\nConnection: close\r\n\r\n"
        )
        status = s.recv(64).split(b"\r\n", 1)[0]
    assert b"400" in status
    assert _state(server)  # still alive


def test_bad_event_is_clean_400(served):
    server, _, _ = served
    comps = _state(server)
    metrics = _by_label(comps, "📊 Ergebnis-Metriken (Gesamt)")
    try:
        status, _ = _post_json(
            server, "/event", {"id": metrics["id"], "event": "click"}
        )
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400


def test_set_cannot_smuggle_path_inside_list(served):
    """file_allowed walks list/tuple component values, so the /set vetting
    must walk them too — a bare-string-only gate let
    {"value": ["/etc/passwd"]} plant a servable path (review finding)."""
    server, _, _ = served
    comps = _state(server)
    name = _by_label(comps, "📝 Preset-Name")
    secret = "/etc/passwd" if os.path.isfile("/etc/passwd") else os.path.abspath(__file__)

    for value in ([secret], [[secret]], {"p": secret}, ("a", secret)):
        try:
            status, _ = _post_json(
                server, "/set", {"id": name["id"], "value": list(value) if isinstance(value, tuple) else value}
            )
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 403, f"nested path smuggled via {value!r}"

    try:
        status, _, _ = _get(server, "/file?path=" + urllib.parse.quote(secret))
    except urllib.error.HTTPError as e:
        status = e.code
    assert status in (403, 404)


def test_wrong_typed_payloads_are_400(served):
    """Non-object JSON bodies and wrong-typed fields must be clean 400s:
    `"id" not in 5` / int([3]) / dict-as-event-name / tuple(5) all raise
    TypeError into the catch-all 500 path (same fuzz-found class as the
    job API's bare-list body, tools/fuzz_campaign.py http seed 700054)."""
    server, demo, _ = served
    comps = _state(server)
    any_id = comps[0]["id"]
    cases = [
        ("/set", [1, 2, 3]),                      # bare list body
        ("/set", 5),                              # bare number body
        ("/set", "id"),                           # bare string body
        ("/set", {"id": [3], "value": "x"}),      # list id
        ("/set", {"id": {"a": 1}, "value": 0}),   # dict id
        ("/event", {"id": any_id, "event": {}}),  # unhashable event name
        ("/event", {"id": any_id, "event": "select", "index": 5}),
        ("/event", {"id": any_id, "event": "select", "index": {"x": 1}}),
        ("/event", {"id": any_id, "event": "click", "set": [1, 2]}),
    ]
    for path, payload in cases:
        try:
            status, _ = _post_json(server, path, payload)
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 400, f"{path} {payload!r} → {status}, want 400"
    # the server is still alive and consistent
    assert _state(server)


def test_client_sets_are_type_vetted(served):
    """POST /set enforces the value types real gradio's frontend can
    produce: without this, arbitrary JSON lands in components and the next
    event fires it into handlers that assume UI-shaped inputs
    (texts.get(unhashable list), marker math on strings/Infinity)."""
    server, _, _ = served
    comps = _state(server)
    by_type = {}
    for c in comps:
        by_type.setdefault(c["type"], c)
    slider = by_type["Slider"]
    checkbox = by_type["Checkbox"]
    dropdown = by_type["Dropdown"]
    textbox = by_type["Textbox"]
    bad = [
        (slider, "0.5"), (slider, [0.5]), (slider, True), (slider, None),
        (checkbox, 1), (checkbox, "true"), (checkbox, None),
        (dropdown, 7), (dropdown, ["Room"]), (dropdown, "NotAChoice"),
        (textbox, 5), (textbox, [1]), (textbox, {"a": 1}),
    ]
    for comp, value in bad:
        try:
            status, _ = _post_json(
                server, "/set", {"id": comp["id"], "value": value}
            )
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 400, f"{comp['type']} accepted {value!r}"
    # Infinity is valid JSON for python's parser but no frontend emits it
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/set",
        data=json.dumps({"id": slider["id"], "value": 1.0}).encode().replace(
            b"1.0", b"Infinity"
        ),
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            status = r.status
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400
    # out-of-range slider values clamp to the widget's bounds (frontend
    # behavior); in-type values round-trip
    status, data = _post_json(server, "/set", {"id": slider["id"], "value": 1e9})
    assert status == 200
    new_val = _by_label(data["components"], slider["label"])["value"]
    assert float(new_val) <= 1e6, "slider value did not clamp"
    # "" is how a <select> with no selection serializes: the built-in JS
    # client echoes it for every null dropdown on EVERY event POST, so it
    # must mean None — rejecting it bricks all UI events after a preset
    # delete (review finding)
    status, data = _post_json(server, "/set", {"id": dropdown["id"], "value": ""})
    assert status == 200
    assert _by_label(data["components"], dropdown["label"])["value"] is None
    if dropdown.get("value") is not None:  # leave the module server tidy
        _post_json(server, "/set", {"id": dropdown["id"],
                                    "value": dropdown["value"]})


def test_negative_component_ids_are_400(served):
    """Negative ids must not resolve via Python negative indexing."""
    server, _, _ = served
    for path, payload in (
        ("/set", {"id": -1, "value": "x"}),
        ("/event", {"id": -1, "event": "click"}),
    ):
        try:
            status, _ = _post_json(server, path, payload)
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 400, f"{path} accepted a negative id"


def test_rejected_event_applies_no_sets(served):
    """A 400 response must mean nothing happened: /event validates the
    (component, event) route BEFORE applying the request's sets."""
    server, _, _ = served
    comps = _state(server)
    metrics = _by_label(comps, "📊 Ergebnis-Metriken (Gesamt)")
    room = _by_label(comps, "📏 Raumgröße (m³)")
    before = room["value"]
    try:
        status, _ = _post_json(
            server, "/event",
            {"id": metrics["id"], "event": "click",
             "set": {str(room["id"]): before + 10}},
        )
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400
    after = _by_label(_state(server), "📏 Raumgröße (m³)")["value"]
    assert after == before, "rejected event still mutated state"


def test_upload_percent_encoded_filename(served, clip):
    """Non-Latin-1 filenames arrive percent-encoded (fetch headers must be
    ISO-8859-1); the server decodes and sanitizes them."""
    server, _, _ = served
    with open(clip, "rb") as fh:
        raw = fh.read()
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/upload",
        data=raw,
        headers={"X-Filename": urllib.parse.quote("🎵 mix.wav")},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        uploaded = json.loads(r.read())["path"]
    assert os.path.isfile(uploaded)
    assert uploaded.endswith(".wav")
    status, _, body = _get(server, "/file?path=" + urllib.parse.quote(uploaded))
    assert status == 200 and body == raw


def test_concurrent_same_name_uploads_do_not_collide(served, clip):
    """/upload takes no lock; the name claim must be atomic."""
    import threading as _t

    server, _, _ = served
    bodies = [b"A" * 4096, b"B" * 4096, b"C" * 4096, b"D" * 4096]
    results = [None] * len(bodies)

    def up(i):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/upload",
            data=bodies[i],
            headers={"X-Filename": "same_name.bin"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            results[i] = json.loads(r.read())["path"]

    threads = [_t.Thread(target=up, args=(i,)) for i in range(len(bodies))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(set(results)) == len(bodies), "paths collided"
    for i, p in enumerate(results):
        with open(p, "rb") as fh:
            assert fh.read() == bodies[i], "one upload overwrote another"


def test_tab2_visualizer_and_profiler_over_http(served, clip):
    """Tab 2 over the wire (reference :1309-1311): process a clip, pull the
    result into the visualizer/profiler via the load-last-result buttons,
    fire both, download the rendered PNGs and read the A/B report."""
    server, _, _ = served
    with open(clip, "rb") as fh:
        raw = fh.read()
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/upload",
        data=raw,
        headers={"X-Filename": "tab2_in.wav"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        uploaded = json.loads(r.read())["path"]

    comps = _state(server)
    audio_in = _by_label(comps, "🔊 Audio hochladen")
    process = _by_label(comps, "➡️ Verarbeiten & Anhören!")
    status, data = _post_json(
        server,
        "/event",
        {"id": process["id"], "event": "click",
         "set": {str(audio_in["id"]): uploaded}},
    )
    assert status == 200
    download = _by_label(data["components"], "💾 Download Ergebnis")
    assert download["value"], "no processed result to feed Tab 2"

    # two load-last-result buttons share one label: visualizer pane first,
    # profiler pane second (studio.py Tab-2 layout)
    loaders = [
        c for c in data["components"]
        if c["label"] == "Lade letztes Ergebnis (Bearb.)"
    ]
    assert len(loaders) == 2
    status, data = _post_json(
        server, "/event", {"id": loaders[0]["id"], "event": "click"}
    )
    assert status == 200
    vis_proc = _by_label(data["components"], "🔍 Bearbeitet (Visualizer)")
    assert vis_proc["value"] == download["value"]

    # visualize both panes: original from the upload, processed just loaded
    vis_orig = _by_label(data["components"], "🔍 Original (Visualizer)")
    show = _by_label(data["components"], "📊 Visualisieren")
    status, data = _post_json(
        server,
        "/event",
        {"id": show["id"], "event": "click",
         "set": {str(vis_orig["id"]): uploaded}},
    )
    assert status == 200
    for label in ("🔵 Original Vis", "🟠 Bearbeitet Vis"):
        pane = _by_label(data["components"], label)
        assert pane["value"] and pane.get("url"), label
        status, ctype, body = _get(server, pane["url"])
        assert status == 200 and ctype == "image/png"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"

    # profiler: load-last into the processed slot, original from the upload
    status, data = _post_json(
        server, "/event", {"id": loaders[1]["id"], "event": "click"}
    )
    assert status == 200
    prof_orig = _by_label(data["components"], "Lade Original (Profiler)")
    analyze = _by_label(data["components"], "🚀 Analysieren!")
    status, data = _post_json(
        server,
        "/event",
        {"id": analyze["id"], "event": "click",
         "set": {str(prof_orig["id"]): uploaded}},
    )
    assert status == 200
    report = _by_label(data["components"], "📋 Analysebericht")["value"]
    assert "Audio-Profiler Bericht" in report
    assert "Integrated LUFS" in report
    assert "Stereo-Breite" in report


class TestHTMLClientContract:
    """Round-4 VERDICT item 7: the page's inline JS was the one untested
    layer of the served UI.  Pin its contract to the runtime so the HTML
    client cannot silently drift from the event graph: every /state
    component renders with a data-id, every endpoint the JS references is
    handled, every event the page fires has a listener, and the map click
    posts the exact SelectData shape the runtime expects."""

    def test_every_state_component_rendered_with_data_id(self, served):
        server, _, _ = served
        _, _, body = _get(server, "/")
        page = body.decode("utf-8")
        for c in _state(server):
            # a component outside any Tab would never render at all
            assert c["tab"], f"component {c['id']} ({c['type']}) has no tab"
            assert f'data-id="{c["id"]}"' in page, (
                c["id"], c["type"], c["label"],
            )

    def test_js_references_only_handled_endpoints(self, served):
        import re

        server, _, _ = served
        _, _, body = _get(server, "/")
        page = body.decode("utf-8")
        urls = set(re.findall(r"""fetch\(\s*['"]([^'"]+)['"]""", page))
        urls |= set(re.findall(r"""post\(\s*['"]([^'"]+)['"]""", page))
        # template-literal fetches (fetch(url) via post()) are covered by
        # the post() captures; the client must reference at least these
        assert {"/state", "/event", "/set", "/upload"} <= urls, urls
        handled = {"/", "/state", "/set", "/event", "/upload", "/file"}
        for u in urls:
            assert u.split("?")[0] in handled, f"JS references unhandled {u}"
        # each POST route answers its error contract, not a 404 (proves the
        # route exists server-side)
        for path in ("/set", "/event"):
            with pytest.raises(urllib.error.HTTPError) as e:
                _post_json(server, path, {})
            assert e.value.code == 400  # "missing 'id'", not "not found"

    def test_page_fires_only_registered_events(self, served):
        import re

        server, _, _ = served
        _, _, body = _get(server, "/")
        page = body.decode("utf-8")
        comps = {c["id"]: c for c in _state(server)}
        fired = re.findall(r"fireEvent\((\d+),'(\w+)'", page)
        assert fired, "the page fires no events at all?"
        for cid, event in fired:
            c = comps[int(cid)]
            assert event in c["events"], (
                f"page fires {event!r} on component {cid} ({c['label']!r}) "
                f"but the runtime has no such listener"
            )
        # and every setValue(id, ...) targets a real component id
        for cid in re.findall(r"setValue\((\d+),", page):
            assert int(cid) in comps

    def test_map_click_posts_select_data_shape(self, served):
        server, _, _ = served
        _, _, body = _get(server, "/")
        page = body.decode("utf-8")
        comps = _state(server)
        maps = [
            c for c in comps
            if c["type"] == "Image" and "select" in c["events"]
        ]
        assert maps, "no clickable map image in the page"
        mid = maps[0]["id"]
        # the page wires the click through mapClick on that exact id
        assert f"mapClick({mid},this,event)" in page
        # mapClick fires: POST /event {id, event:'select', index:[x,y], set}
        # — the same SelectData shape the runtime expects (index tuple)
        status, data = _post_json(
            server,
            "/event",
            {"id": mid, "event": "select", "index": [400, 300], "set": {}},
        )
        assert status == 200
        after = {c["id"]: c for c in data["components"]}
        x = _by_label(data["components"], "↔️ X (L/R)")
        y = _by_label(data["components"], "↕️ Y (F/B)")
        # a mid-map click lands strictly inside the unit square
        assert 0.0 <= float(x["value"]) <= 1.0
        assert 0.0 <= float(y["value"]) <= 1.0
        marker_img = _by_label(data["components"], "🎯 Position (X/Y)")
        assert marker_img["value"], "marker image not updated by map click"
