"""Structured evidence export (ISREvidenceExporter analog).

The reference dumps a directory of JSON audit artifacts with provenance
enrichment and a manifest hash (src/audioengine/ISREvidenceExporter.cpp:
93-137, evidence_manifest.json / verifier_manifest_hash.txt); these tests
pin the analog contracts: one artifact per live subsystem, enrichment
keys injected only when absent, sha256 manifest integrity, run-id env
override, and truthful content for the subsystems exercised.
"""
import json

import numpy as np
import pytest

from convopeq_tpu.engine import ConvoPeqEngine
from convopeq_tpu.runtime.evidence import (
    EvidenceExporter, enrich, resolve_run_id, verify_evidence_dir,
    RUN_ID_ENV, RUN_ID_ENV_REF, DEFAULT_RUN_ID)

SR = 48000.0
RNG = np.random.default_rng(11)


def _exercised_engine(tmp_path):
    import jax.numpy as jnp
    eng = ConvoPeqEngine(SR, 512, mixed_phase_cache_dir=tmp_path / "mp")
    ir = np.zeros((2, 4096))
    ir[:, 0] = 1.0
    ir[:, 100] = 0.25
    eng.load_impulse_response(ir, SR)
    eng.set_eq_band(0, band_type=1, freq=1000.0, gain_db=3.0, q=1.0,
                    enabled=True)
    x = jnp.asarray(RNG.normal(size=(1, 2, 2048)) * 0.1)
    _, st = eng.process_streaming(x)
    # config change mid-stream -> crossfade activation recorded
    eng.set_eq_band(1, band_type=1, freq=2000.0, gain_db=-2.0, q=1.0,
                    enabled=True)
    _, st = eng.process_streaming(x, st)
    return eng


def test_export_writes_full_artifact_set(tmp_path):
    eng = _exercised_engine(tmp_path)
    out = tmp_path / "evidence"
    manifest = eng.export_evidence_dir(out)

    names = set(EvidenceExporter.BUILDERS)
    assert set(manifest["artifacts"]) == names
    for name in names | {"evidence_manifest.json"}:
        payload = json.loads((out / name).read_text())
        # enrichment contract (cpp:104-137)
        assert payload["artifact"] == name
        assert payload["provenance"] == "runtime"
        assert payload["runId"] == DEFAULT_RUN_ID
        assert isinstance(payload["generatedAtNs"], int)
    assert (out / "verifier_manifest_hash.txt").exists()

    # integrity pass
    res = verify_evidence_dir(out)
    assert res["ok"], res
    assert res["artifactCount"] == len(names)


def test_artifact_contents_reflect_engine_activity(tmp_path):
    eng = _exercised_engine(tmp_path)
    out = tmp_path / "evidence"
    eng.export_evidence_dir(out)
    load = lambda n: json.loads((out / n).read_text())

    snap = load("runtime_snapshot.json")
    assert snap["sample_rate"] == SR and snap["block_size"] == 512
    assert snap["partition_plan"][0]["part_size"] >= 32
    assert snap["latency_total_samples"] >= 0

    health = load("deferred_health.json")
    assert health["steps"] >= 8 and "xruns" in health

    budget = load("runtime_budget_report.json")
    assert budget["stages"]          # stage timers fired
    for st in budget["stages"].values():
        assert st["count"] > 0 and st["mean_us"] >= 0.0

    pub = load("publication_progress_log.json")
    assert pub["ir_generation"] == 1
    assert pub["streaming_chain_key"] is not None
    assert len(pub["prepared_ir_cache_keys"]) >= 1

    xf = load("crossfade_trace.json")
    assert xf["crossfadeCount"] >= 1
    assert xf["recent"][0]["detail"]["triggers"]

    auth = load("authority_verification_report.json")
    assert auth["verified"] is True
    assert auth["state_sha256"] == auth["roundtrip_sha256"]
    assert auth["chain_key_match"] is True

    cache = load("cache_report.json")
    assert cache["prepared_ir_cache"]["entries"] >= 1
    assert cache["compiled_chain_cache"]["max_entries"] == 8

    world = load("world_lifecycle_audit.json")
    assert world["ir_loaded"] is True and world["ir_generation"] == 1
    assert world["ir_taps"] > 0

    tier = load("payload_tier_report.json")
    assert tier["backend"] in ("cpu", "tpu", "axon")
    assert set(tier["kernel_gates"]) == {
        "pallas_fft", "pallas_frames_fwd", "pallas_mac", "pallas_dd"}

    learner = load("learner_report.json")
    assert learner["session_active"] is False
    assert learner["banks_populated"] == 0

    lat = load("latency_report.json")
    # concrete expected values for THIS config (block 512, no OS, no
    # soft clip, IR peak at sample 0) — and the exported report must
    # agree field-for-field with the live engine breakdown
    bd = eng.latency_breakdown()
    assert lat["algorithm_latency_samples"] == \
        bd.algorithm_latency_samples == 512      # = L0 partition size
    assert lat["oversampling_latency_samples"] == \
        bd.oversampling_latency_samples == 0     # os_factor 1
    assert lat["softclip_latency_samples"] == \
        bd.softclip_latency_samples == 0         # soft clip disabled
    assert lat["ir_peak_latency_samples"] == bd.ir_peak_latency_samples
    assert lat["total_latency_samples"] == bd.total_latency_samples

    build = load("convolver_build_report.json")
    assert build["ir_loaded"] is True
    assert {c["channel"] for c in build["channels"]} == {"left", "right"}
    for ch in build["channels"]:
        assert sum(lp["length"] for lp in ch["layers"]) + \
            ch["direct_taps"] >= 4096   # covers the loaded IR
        for lp in ch["layers"]:
            assert lp["num_parts"] >= 1 and lp["part_size"] >= 32

    gp = load("gain_plan_report.json")
    assert gp["auto_gain_enabled"] is False
    assert gp["linear"]["input_headroom"] == pytest.approx(
        10.0 ** (gp["input_headroom_db"] / 20.0))

    chain = load("dsp_chain_report.json")
    assert chain["order"] in ("eq_then_convolver", "convolver_then_eq")
    assert chain["oversampling"]["resolved"] >= 1
    assert chain["dither"] == {"type": 0, "bit_depth": 0}


def test_run_id_env_override(tmp_path, monkeypatch):
    # framework-native name wins, reference name honored as fallback
    monkeypatch.setenv(RUN_ID_ENV_REF, "ref-run-7")
    assert resolve_run_id() == "ref-run-7"
    monkeypatch.setenv(RUN_ID_ENV, "native-run-3")
    assert resolve_run_id() == "native-run-3"

    eng = ConvoPeqEngine(SR, 512, mixed_phase_cache_dir=tmp_path / "mp")
    out = tmp_path / "evidence"
    eng.export_evidence_dir(out)
    snap = json.loads((out / "runtime_snapshot.json").read_text())
    assert snap["runId"] == "native-run-3"


def test_enrich_does_not_overwrite_existing_keys():
    payload = {"runId": "mine", "provenance": "test-bench", "value": 1}
    out = enrich(payload, "x.json")
    assert out["runId"] == "mine"
    assert out["provenance"] == "test-bench"
    assert out["artifact"] == "x.json"
    assert "generatedAtNs" in out


def test_manifest_detects_tamper(tmp_path):
    eng = ConvoPeqEngine(SR, 512, mixed_phase_cache_dir=tmp_path / "mp")
    out = tmp_path / "evidence"
    eng.export_evidence_dir(out)
    p = out / "deferred_health.json"
    p.write_text(p.read_text().replace("HEALTHY", "TAMPERED"))
    res = verify_evidence_dir(out)
    assert not res["ok"]
    assert "deferred_health.json" in res["mismatches"]


def test_health_and_policy_histories_record_transitions():
    from convopeq_tpu.runtime.telemetry import (
        Health, RuntimeHealthMonitor, RuntimePolicyEngine)
    t = [0.0]
    hm = RuntimeHealthMonitor(now_fn=lambda: t[0])
    hm.tick(xruns=50, steps=100)            # -> CRITICAL
    t[0] += 31.0
    hm.tick(xruns=0, steps=100)             # de-escalate -> DEGRADED
    names = [(h["from"], h["to"]) for h in hm.history]
    assert ("HEALTHY", "CRITICAL") in names
    assert ("CRITICAL", "DEGRADED") in names

    pe = RuntimePolicyEngine()
    pe.evaluate(Health.CRITICAL)
    pe.evaluate(Health.HEALTHY)
    trans = [(h["from"], h["to"]) for h in pe.history]
    assert trans[0] == ("OBSERVE", "RECOVER")
    assert trans[1] == ("RECOVER", "THROTTLE")
