"""Resume-continuity verifier for training runs (flagship campaign phase B).

Reads a run's ``metrics.jsonl`` and asserts the post-resume curve is the
SAME curve:

* steps strictly increase across a *graceful* preemption (SIGTERM saves
  ``resume_state`` at the exact kill step, so nothing replays);
* a *hard* kill (SIGKILL / host death) may legitimately replay up to
  ``saveStateEverySteps`` steps since the last resume point — replays must
  land only on previously-seen steps AND reproduce the original
  ``weighted_loss`` (step-keyed RNG + restored data order make the
  replayed steps deterministic, so this doubles as an on-chip
  determinism check);
* the mean loss just after the resume point stays within 3x the mean
  just before it (optimizer/EMA state actually restored, not re-inited).

Counterpart in the reference: none — epoch-granular Lightning checkpoints
(/root/reference/genie/diffusion/genie.py) restart mid-epoch work from
scratch and keep no step-level resume evidence at all.

Usage: python tools/campaign_continuity.py VERSION_DIR PREEMPT_STEP
Prints a one-line JSON report; exits nonzero on any violation.
"""

import json
import os
import statistics
import sys


def load_train_records(version_dir):
    """All train-prefix records from a run's metrics.jsonl, in file order.

    The single definition of "a train record" for campaign tooling — the
    shell driver's STEP_A probe and summary both call this, so a change
    to the logger's serialization cannot silently desynchronize them."""
    path = os.path.join(version_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return []
    recs = [json.loads(l) for l in open(path) if l.strip()]
    return [r for r in recs if r.get("prefix") == "train"]


def check_continuity(version_dir, preempt_step):
    """Verify metrics.jsonl continuity across a preemption at
    ``preempt_step``; returns the report dict or raises AssertionError."""
    recs = load_train_records(version_dir)
    steps = [r["step"] for r in recs]
    resumed = [s for s in steps if s > preempt_step]
    assert resumed, f"no steps after the preemption point {preempt_step}"

    first_loss, seen, replay_delta, hwm = {}, set(), [], None
    for r in recs:
        s = r["step"]
        if hwm is not None and s <= hwm:
            assert s in seen, f"step {s} went backwards past any seen step"
            replay_delta.append(abs(r["weighted_loss"] - first_loss[s]))
        seen.add(s)
        first_loss.setdefault(s, r["weighted_loss"])
        hwm = s if hwm is None else max(hwm, s)

    pre = [r["weighted_loss"] for r in recs if r["step"] <= preempt_step][-20:]
    post = [r["weighted_loss"] for r in recs if r["step"] > preempt_step][:20]
    out = {
        "preempted_at_step": preempt_step,
        "resumed_through_step": max(steps),
        "loss_window_post_resume": round(statistics.mean(post), 4),
    }
    if replay_delta:
        out["hard_kill_replayed_steps"] = len(replay_delta)
        out["replay_max_loss_delta"] = max(replay_delta)
        assert max(replay_delta) < 1e-3, \
            "replayed steps did not reproduce the original loss curve"
    if pre:  # a compile-dominated phase A may not have reached a log point
        out["loss_window_pre_kill"] = round(statistics.mean(pre), 4)
        assert statistics.mean(post) < 3 * statistics.mean(pre) + 1e-3, \
            "loss jumped after resume — optimizer state not restored?"
    return out


if __name__ == "__main__":
    print(json.dumps(check_continuity(sys.argv[1], int(sys.argv[2]))))
