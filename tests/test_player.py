"""Interactive replay player (io/player.py): the file_player analog.

Covers the ReplayClock playhead semantics (TimerCallback,
ROSThread.cpp:572-584), pacing/skip/quit controls, loop replay, and
trajectory equivalence between paced replay through DatasetPlayer and the
established arrival-ordered OnlineEstimator feed."""
import numpy as np
import jax.numpy as jnp
import pytest

from malio_tpu import config as cfg_mod
from malio_tpu.io import dataset as ds
from malio_tpu.io.export import write_dataset
from malio_tpu.io.player import DatasetPlayer, ReplayClock, read_data_stamp
from malio_tpu.io.synthetic import SyntheticSequence
from malio_tpu.online import OnlineEstimator


def _cfg():
    return cfg_mod.city_ouster_config(
        max_raw_points=512,
        max_points_per_scan=512,
        map_capacity=1 << 15,
    )


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    root = tmp_path_factory.mktemp("player_ds")
    seq = SyntheticSequence(duration=2.0, num_lidars=1, points_per_scan=256)
    imu, rounds, traj = seq.generate()
    write_dataset(root, imu, rounds, ["ouster"], traj=traj)
    return root


class FakeTime:
    """Deterministic wall clock: sleep() advances it."""

    def __init__(self):
        self.t = 100.0

    def time(self):
        return self.t

    def sleep(self, dt):
        self.t += dt


def test_replay_clock_rate_pause_seek():
    ft = FakeTime()
    c = ReplayClock(rate=2.0, time_fn=ft.time)
    ft.sleep(1.0)
    assert c.now() == pytest.approx(2.0)
    c.pause()
    ft.sleep(5.0)
    assert c.now() == pytest.approx(2.0)  # frozen while paused
    c.resume()
    ft.sleep(0.5)
    assert c.now() == pytest.approx(3.0)
    c.set_rate(0.5)
    ft.sleep(2.0)
    assert c.now() == pytest.approx(4.0)  # rate change settles first
    c.seek(10.0)
    assert c.now() == pytest.approx(10.0)
    ft.sleep(1.0)
    assert c.now() == pytest.approx(10.5)


def test_data_stamp_names_match_reference_dispatch(exported):
    """Exporter writes the reference's dispatch keys (ROSThread.cpp:440-456)."""
    rows = read_data_stamp(exported / "sensor_data" / "data_stamp.csv")
    names = {n for _, n in rows}
    assert names == {"imu", "ouster"}
    stamps = [s for s, _ in rows]
    assert stamps == sorted(stamps)


def test_player_matches_online_feed(exported):
    """Full-speed DatasetPlayer == arrival-ordered OnlineEstimator feed on
    the offline-decoded rounds (identical groups -> identical trajectory)."""
    cfg = _cfg()
    player = DatasetPlayer(exported, cfg, ["ouster"], dtype=jnp.float64,
                           realtime=False)
    res = player.run()
    player.close()
    assert res["n_rounds"] >= 10
    assert res["n_dropped_scans"] == 0

    imu, rounds = ds.load_sequence(
        exported, ["ouster"], list(cfg.lid_type), list(cfg.point_filter_num),
        list(cfg.n_scans), cfg.blind,
    )
    est = OnlineEstimator(cfg, dtype=jnp.float64)
    # arrival order mirrors the player's: each scan is dispatched at its
    # data_stamp entry, which is the scan's file stamp = BEGIN time
    # (export.py names files by beg_t, like the reference datasets)
    events = [("imu", row[0], row) for row in imu]
    for rnd in rounds:
        for l, s in enumerate(rnd):
            rel = s["pts"].copy()
            rel[:, 3] -= s["beg_t"]
            events.append(
                ("scan", s["beg_t"], (l, s["beg_t"], rel, s["end_t"] - s["beg_t"]))
            )
    events.sort(key=lambda e: e[1])
    recs = []
    for kind, _, payload in events:
        if kind == "imu":
            est.push_imu(payload[0], payload[1:4], payload[4:7])
        else:
            l, beg, rel, dur = payload
            est.push_scan(l, beg, rel, duration=dur)
        recs.extend(est.poll())
    est.flush()
    recs.extend(est.poll())

    assert len(recs) == res["n_rounds"]
    pos = np.asarray([r["pos"] for r in recs])
    np.testing.assert_allclose(res["pos"], pos, atol=1e-5)
    np.testing.assert_allclose(
        res["t"], np.asarray([r["t"] for r in recs]), atol=1e-9
    )


def test_player_paced_rate_and_skip(exported):
    """Paced replay consumes ~span/rate of (fake) wall time; skip_gap
    short-circuits every wait (the functional skip-stop)."""
    cfg = _cfg()
    ft = FakeTime()
    player = DatasetPlayer(
        exported, cfg, ["ouster"], dtype=jnp.float64, realtime=True,
        rate=4.0, time_fn=ft.time, sleep_fn=ft.sleep,
    )
    w0 = ft.t
    res = player.run()
    wall = ft.t - w0
    player.close()
    assert res["n_rounds"] >= 10
    assert wall == pytest.approx(player.span / 4.0, rel=0.15)

    ft2 = FakeTime()
    skipper = DatasetPlayer(
        exported, cfg, ["ouster"], dtype=jnp.float64, realtime=True,
        rate=1.0, skip_gap=1e-3, time_fn=ft2.time, sleep_fn=ft2.sleep,
    )
    w0 = ft2.t
    res2 = skipper.run()
    wall2 = ft2.t - w0
    skipper.close()
    assert res2["n_rounds"] == res["n_rounds"]
    assert wall2 < 0.2 * skipper.span  # waits skipped, not paced
    np.testing.assert_allclose(res2["pos"], res["pos"], atol=1e-12)


def test_player_quit_control(exported):
    """control() returning False stops replay mid-lap (the 'q' key)."""
    cfg = _cfg()
    calls = [0]

    def control(p):
        calls[0] += 1
        return calls[0] < 40

    player = DatasetPlayer(exported, cfg, ["ouster"], dtype=jnp.float64,
                           realtime=False)
    res = player.run(control=control)
    player.close()
    assert res["n_rounds"] < 15  # stopped early
    assert res["n_laps"] == 1


def test_player_loop_restarts_fresh(exported):
    """loop: each lap restarts a fresh estimator (deliberate divergence
    from the reference, which republishes into a running node)."""
    cfg = _cfg()
    player = DatasetPlayer(exported, cfg, ["ouster"], dtype=jnp.float64,
                           realtime=False, loop=True)
    res = player.run(max_laps=2)
    player.close()
    assert res["n_laps"] == 2
    a, b = res["laps"]
    assert a["n_rounds"] == b["n_rounds"] >= 10
    np.testing.assert_allclose(a["pos"], b["pos"], atol=0)
    np.testing.assert_allclose(a["t"], b["t"], atol=0)
