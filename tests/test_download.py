"""Data-acquisition helpers (downloader logic, ffmpeg-gated parts excluded)."""

from pathlib import Path

from cross_attention_renderer_tpu.data import download as dl


def test_parse_scene_txt(tmp_path):
    txt = tmp_path / 'scene001.txt'
    txt.write_text('https://www.youtube.com/watch?v=abc\n'
                   '153000 0.9 1.6 0.5 0.5 0 0 1 0 0 0\n'
                   '286000 0.9 1.6 0.5 0.5 0 0 1 0 0 0\n')
    url, ts = dl.parse_scene_txt(txt)
    assert url.endswith('abc')
    assert ts == [153000, 286000]


def test_timestamp_format():
    # 1 hour, 2 min, 3 sec, 456 ms in microseconds
    us = ((1 * 3600 + 2 * 60 + 3) * 1000 + 456) * 1000
    assert dl._timestamp_str(us) == '01:02:03.456'
    assert dl._timestamp_str(0) == '00:00:00.000'


def test_build_dataset_logs_failures(tmp_path):
    (tmp_path / 'poses').mkdir()
    (tmp_path / 'poses' / 'sceneA.txt').write_text(
        'https://youtu.be/x\n1000 0 0 0 0 0 0\n')
    failed = dl.build_dataset(tmp_path / 'poses', tmp_path / 'out',
                              fetcher=lambda url, out: None)
    assert failed == ['sceneA']
    assert 'sceneA' in (tmp_path / 'out' / 'failed_videos.txt').read_text()
