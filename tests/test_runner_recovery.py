"""Injected-crash drill for scripts/run_tests.sh (VERDICT r3 #7): a
SIGSEGV mid-suite must cost one fresh-process resume from the crashed
file — not a quarter-suite rerun — and recover in well under a minute.
A file that crashes deterministically must be isolated and reported
without sinking the rest of the suite."""

import os
import signal
import subprocess
import textwrap
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "run_tests.sh")


def _run(drill_dir, timeout=120):
    env = dict(os.environ, RT_TEST_DIR=str(drill_dir))
    # a private lock file: the drill must not serialize against (or be
    # blocked by) a real suite run
    env["RT_LOCK"] = str(drill_dir / "lock")
    t0 = time.time()
    proc = subprocess.run(["bash", SCRIPT, "-p", "no:cacheprovider"],
                          cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=timeout)
    return proc, time.time() - t0


def _write(d, name, body):
    (d / name).write_text(textwrap.dedent(body))


def test_segfault_once_recovers(tmp_path):
    d = tmp_path / "drill"
    d.mkdir()
    _write(d, "test_a_ok.py", """
        def test_a():
            assert True
    """)
    _write(d, "test_b_crash_once.py", f"""
        import os, signal

        def test_crashes_first_run_only():
            sentinel = {str(tmp_path / 'crashed_once')!r}
            if not os.path.exists(sentinel):
                open(sentinel, 'w').close()
                os.kill(os.getpid(), signal.SIGSEGV)
            assert True
    """)
    _write(d, "test_z_ok.py", """
        def test_z():
            assert True
    """)
    proc, dt = _run(d)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "resuming there" in proc.stdout + proc.stderr
    assert dt < 60, f"recovery took {dt:.1f}s"


def test_deterministic_crasher_is_isolated_and_reported(tmp_path):
    d = tmp_path / "drill"
    d.mkdir()
    _write(d, "test_a_ok.py", """
        def test_a():
            assert True
    """)
    _write(d, "test_b_always_crashes.py", """
        import os, signal

        def test_always_crashes():
            os.kill(os.getpid(), signal.SIGSEGV)
    """)
    _write(d, "test_z_ok.py", """
        import os

        def test_z_runs(tmp_path_factory):
            assert True
    """)
    proc, dt = _run(d)
    # the crasher is a real failure...
    assert proc.returncode != 0
    assert "fails ALONE" in proc.stdout + proc.stderr
    # ...but the suite continued past it: the z file's tests ran
    assert "test_z_ok.py" in proc.stdout
    assert dt < 90, f"drill took {dt:.1f}s"


def test_failure_before_crash_is_not_lost(tmp_path):
    """A real test FAILURE recorded before the segfault must survive the
    crash-resume (the resume drops completed files, so their F markers
    are latched from the progress lines)."""
    d = tmp_path / "drill"
    d.mkdir()
    _write(d, "test_a_fails.py", """
        def test_fails():
            assert False, "real regression"
    """)
    _write(d, "test_b_crash_once.py", f"""
        import os, signal

        def test_crashes_first_run_only():
            sentinel = {str(tmp_path / 'crashed_once')!r}
            if not os.path.exists(sentinel):
                open(sentinel, 'w').close()
                os.kill(os.getpid(), signal.SIGSEGV)
            assert True
    """)
    _write(d, "test_z_ok.py", """
        def test_z():
            assert True
    """)
    proc, dt = _run(d)
    assert proc.returncode != 0, proc.stdout + proc.stderr
    assert "failures recorded before the crash" in proc.stderr
