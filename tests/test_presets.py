"""Preset store: v4 JSON schema, sanitization, last-used, CRUD, ZIP export."""

import json
import zipfile

import pytest

from audio_raytracing_studio_tpu import config
from audio_raytracing_studio_tpu.params import RenderParams
from audio_raytracing_studio_tpu.utils.presets import PresetStore


@pytest.fixture
def store(tmp_path):
    return PresetStore(str(tmp_path))


def test_save_schema_exact_keys(store):
    p = RenderParams(hall_type="Cathedral", room_size=250.0)
    _, filename = store.save("My Hall", p)
    assert filename == "My_Hall_v4.json"
    data = json.loads(open(f"{store.preset_dir}/{filename}", encoding="utf-8").read())
    assert list(data.keys()) == config.PRESET_KEYS + ["_source_name", "_version"]
    assert data["hall_type"] == "Cathedral"
    # the reference compares the PRE-underscore safe base ("My Hall") with
    # the stripped name (raytracer_studio.py:891): identical → null.  The
    # space-containing name is the common case; writing the name here would
    # diverge from the reference's JSON bytes.
    assert data["_source_name"] is None


def test_source_name_none_when_safe(store):
    _, filename = store.save("CleanName", RenderParams())
    data = json.loads(open(f"{store.preset_dir}/{filename}", encoding="utf-8").read())
    assert data["_source_name"] is None


def test_source_name_written_when_chars_filtered(store):
    """Only names that LOSE characters to sanitization record _source_name
    (ref :891) — and it is the STRIPPED name that gets recorded."""
    _, filename = store.save("  Mö Hall! ", RenderParams())
    data = json.loads(open(f"{store.preset_dir}/{filename}", encoding="utf-8").read())
    # 'ö' survives (isalnum), '!' is filtered → base "Mö Hall" != "Mö Hall!"
    assert data["_source_name"] == "Mö Hall!"
    assert filename == "Mö_Hall_v4.json"


def test_sanitization():
    assert PresetStore.sanitize_name("a/b:c*d") == "abcd_v4.json"
    assert PresetStore.sanitize_name("  my preset  ") == "my_preset_v4.json"
    assert PresetStore.sanitize_name("///") is None
    assert PresetStore.sanitize_name("") is None


def test_roundtrip(store):
    p = RenderParams(dry_wet=0.77, x_pos=0.12, target_layout="7.1 (Surround)")
    _, filename = store.save("rt", p)
    loaded = store.load(filename)
    assert loaded == p


def test_load_coerces_types(store):
    store.ensure_dir()
    with open(f"{store.preset_dir}/weird_v4.json", "w") as f:
        json.dump({"use_external_ir": 1, "room_size": "250", "dry_wet": None}, f)
    p = store.load("weird_v4.json")
    assert p.use_external_ir is True
    assert p.room_size == 250.0
    assert p.dry_wet == config.PRESET_DEFAULTS["dry_wet"]  # None → default


def test_load_coerces_non_string_choice_keys(store):
    """A JSON object/array/number in a choice key (hall_type, material,
    target_layout) must coerce to the default like wrong-typed floats do —
    an uncoerced dict later TypeErrors as an unhashable HALL_PRESETS key,
    which the serving API would surface as a 500 instead of rendering."""
    store.ensure_dir()
    with open(f"{store.preset_dir}/odd_v4.json", "w") as f:
        json.dump(
            {"hall_type": {"a": 1}, "material": [2], "target_layout": 7}, f
        )
    p = store.load("odd_v4.json")
    assert p.hall_type == config.PRESET_DEFAULTS["hall_type"]
    assert p.material == config.PRESET_DEFAULTS["material"]
    assert p.target_layout == config.PRESET_DEFAULTS["target_layout"]
    # and the coerced params drive the host param math without crashing
    from audio_raytracing_studio_tpu.params import adjust_parameters_for_3d

    adjust_parameters_for_3d(p.hall_type, p.room_size, p.z_pos)


def test_overlong_names_are_clean_valueerror(store):
    """Names past the filesystem's 255-byte limit must be invalid-name
    ValueErrors, not ENAMETOOLONG OSErrors (fuzz-found: preset mode seed
    1000032 — an OSError is a 500 over HTTP, not the clean 400)."""
    long_ascii = "A" * 400
    long_multibyte = "ä" * 200  # 200 chars but 400 UTF-8 bytes
    assert PresetStore.sanitize_name(long_ascii) is None
    assert PresetStore.sanitize_name(long_multibyte) is None
    for name in (long_ascii, long_multibyte):
        with pytest.raises(ValueError, match="invalid preset name"):
            store.save(name, RenderParams())
        with pytest.raises(ValueError, match="invalid preset filename"):
            store.load(name + "_v4.json")
        assert store.delete(name + "_v4.json") is False
    # a 255-byte name still works end-to-end
    ok = "B" * (255 - len("_v4.json"))
    _, filename = store.save(ok, RenderParams())
    assert len(filename.encode()) == 255
    store.load(filename)


def test_load_non_object_json_is_clean_valueerror(store):
    """A preset file may legally parse to ANY JSON value; .get on a list
    was an AttributeError (a 500 over HTTP, not the clean 400 of the error
    contract — the same fuzz-found class as the job API's bare-list body)."""
    store.ensure_dir()
    for body in ("[1, 2]", "5", '"name"', "null", "true"):
        with open(f"{store.preset_dir}/bare_v4.json", "w") as f:
            f.write(body)
        with pytest.raises(ValueError, match="JSON object"):
            store.load("bare_v4.json")


def test_last_used_tracking(store):
    _, f1 = store.save("one", RenderParams())
    assert store.load_last() == f1
    _, f2 = store.save("two", RenderParams())
    assert store.load_last() == f2
    store.load(f1)
    assert store.load_last() == f1


def test_delete_clears_last(store):
    _, f1 = store.save("gone", RenderParams())
    assert store.delete(f1) is True
    assert store.load_last() is None
    assert store.delete(f1) is False  # already gone


def test_last_pointer_invalidated_when_file_missing(store):
    store.save_last("nonexistent_v4.json")
    assert store.load_last() is None
    # pointer file cleared afterwards
    assert open(store.last_preset_file).read().strip() == ""


def test_list_sorted_case_insensitive(store):
    store.save("Zeta", RenderParams())
    store.save("alpha", RenderParams())
    store.save("Beta", RenderParams())
    names = store.list_presets()
    assert names == sorted(names, key=str.lower)
    assert len(names) == 3


def test_zip_export(store, tmp_path):
    store.save("a", RenderParams())
    store.save("b", RenderParams())
    zpath = store.export_zip(str(tmp_path / "out.zip"))
    with zipfile.ZipFile(zpath) as zf:
        assert sorted(zf.namelist()) == ["a_v4.json", "b_v4.json"]


def test_zip_export_empty(store):
    assert store.export_zip() is None


def test_traversal_names_rejected(store, tmp_path):
    """Traversal-shaped names must never escape preset_dir: the HTTP studio
    passes client-controlled strings straight into load/delete."""
    victim = tmp_path / "victim.json"
    victim.write_text("{}")
    outside = tmp_path / "outside.txt"
    outside.write_text("keep me")

    store.ensure_dir()
    for name in (
        "../victim.json",
        "../outside.txt",
        "..",
        "a/b.json",
        "a\\b.json",
        "no_extension",
        "",
        None,
    ):
        with pytest.raises((ValueError, TypeError)):
            store.load(name)
        assert store.delete(name) is False
    assert victim.exists() and outside.exists()

    # the last-used pointer is also validated through the same gate
    with open(store.last_preset_file, "w", encoding="utf-8") as f:
        f.write("../victim.json")
    assert store.load_last() is None
    assert victim.exists()

    # legit names still round-trip
    _, fname = store.save("ok", RenderParams())
    assert isinstance(store.load(fname), RenderParams)
    assert store.delete(fname) is True
