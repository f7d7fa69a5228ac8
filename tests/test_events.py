"""EventStorage / writer behavior (reference tests/test_events.py)."""

import json
import os

from detectron2_centernet_tpu.utils.events import (
    EventStorage,
    JSONWriter,
    get_event_storage,
)


def test_storage_scalars_and_smoothing():
    with EventStorage(0) as storage:
        for i in range(10):
            storage.put_scalar("loss", float(i), smoothing_hint=True)
            storage.put_scalar("lr", float(i) * 2, smoothing_hint=False)
            storage.step()
        latest = storage.latest_with_smoothing_hint(window_size=4)
        assert latest["loss"][0] == 7.5  # median of [6,7,8,9]
        assert latest["lr"][0] == 18.0  # unsmoothed latest
        assert storage.history("loss").latest() == 9.0


def test_storage_name_scope_and_stack():
    with EventStorage(0) as storage:
        assert get_event_storage() is storage
        with storage.name_scope("stage1"):
            storage.put_scalar("x", 1.0)
        assert "stage1/x" in storage.latest()


def test_json_writer(tmp_path):
    path = os.path.join(str(tmp_path), "metrics.json")
    with EventStorage(0) as storage:
        writer = JSONWriter(path, window_size=2)
        storage.put_scalar("key", 3.0)
        writer.write()
        storage.step()
        storage.put_scalar("key", 5.0)
        writer.write()
        writer.close()
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert lines[0]["key"] == 3.0
    assert lines[0]["iteration"] == 0
    assert lines[1]["iteration"] == 1
