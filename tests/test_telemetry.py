"""Telemetry, XRUN detection, health monitor, policy ladder."""
import json
import time

import numpy as np

from convopeq_tpu.runtime.telemetry import (
    TelemetryRecorder, StageTimer, XrunDetector, RuntimeHealthMonitor,
    RuntimePolicyEngine, Health, PolicyLevel)


def test_recorder_and_stage_timer():
    rec = TelemetryRecorder(capacity=4)
    with StageTimer(rec, "eq", budget_us=1e6):
        pass
    rec.push("conv", duration_us=100.0)
    for i in range(10):
        rec.push("tick")
    assert len(rec.events) == 4            # bounded ring
    assert rec.stage_stats["eq"]["count"] == 1
    assert rec.stage_stats["conv"]["max_us"] == 100.0
    blob = json.loads(rec.export_evidence())
    assert blob["seq"] == 12
    assert "stage_stats" in blob
    drained = rec.drain()
    assert len(drained) == 4 and len(rec.events) == 0


def test_xrun_detector():
    det = XrunDetector(48000.0, 480)      # 10 ms blocks, threshold 15 ms
    assert not det.record_step(0.005)
    assert det.record_step(0.020)         # over 1.5x duration
    assert det.xruns == 1 and det.steps == 2


def test_health_monitor_hysteresis():
    t = [0.0]
    mon = RuntimeHealthMonitor(now_fn=lambda: t[0])
    assert mon.tick(0, 1000) == Health.HEALTHY
    assert mon.tick(50, 1000) == Health.DEGRADED
    # immediate recovery is held back
    t[0] = 5.0
    assert mon.tick(0, 1000) == Health.DEGRADED
    t[0] = 15.1
    assert mon.tick(0, 1000) == Health.HEALTHY
    # critical needs 30 s
    assert mon.tick(200, 1000) == Health.CRITICAL
    t[0] = 30.0
    assert mon.tick(0, 1000) == Health.CRITICAL
    t[0] = 50.0
    assert mon.tick(0, 1000) == Health.DEGRADED


def test_policy_ladder():
    pol = RuntimePolicyEngine()
    assert pol.evaluate(Health.HEALTHY) == PolicyLevel.OBSERVE
    assert pol.evaluate(Health.DEGRADED) == PolicyLevel.THROTTLE
    assert pol.evaluate(Health.CRITICAL) == PolicyLevel.RESTORE
    assert pol.evaluate(Health.CRITICAL) == PolicyLevel.CRITICAL
    assert "mute_output" in pol.actions
    # steps back down one level per healthy evaluation
    assert pol.evaluate(Health.HEALTHY) == PolicyLevel.SAFE
    assert pol.evaluate(Health.HEALTHY) == PolicyLevel.RESTORE


def test_recorder_counts_drops():
    from convopeq_tpu.runtime.telemetry import TelemetryRecorder
    rec = TelemetryRecorder(capacity=8)
    for i in range(20):
        rec.push("evt", duration_us=1.0)
    assert len(rec.events) == 8
    assert rec.dropped == 12


def test_xrun_warmup_exemption():
    import time
    from convopeq_tpu.runtime.telemetry import XrunDetector
    det = XrunDetector(48000.0, 512)           # 10.67 ms budget
    det.record_step(1.0)                        # huge first step...
    assert det.xruns == 1 and det.steps == 1
    time.sleep(0.05)                            # long inter-step gap
    assert det.record_step(0.0, count_xrun=False) is False
    assert det.xruns == 1 and det.steps == 2    # counted, not an xrun
    assert det.record_step(0.0) is False        # clock was reset
