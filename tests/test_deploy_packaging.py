"""Container packaging validation (reference analogue: Dockerfile:1-96,
Dockerfile.api:1-42, terraform/main.tf:22-120).

No container daemon exists in this environment, so these tests lint the
checked-in Containerfiles against the repo: every COPY source must
exist, the CMD entrypoint must be the packaged console script, env-var
defaults must point at real files, and the serving.redis_url config knob
the API container wires must actually reach FeatureCache.
"""

import re
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DEPLOY = REPO / "deploy"

CONTAINERFILES = ["Containerfile.api", "Containerfile.train"]


def _lines(path: Path):
    """Logical dockerfile lines with backslash continuations joined."""
    raw = path.read_text().splitlines()
    out, cur = [], ""
    for ln in raw:
        s = ln.strip()
        if s.startswith("#") and not cur:
            continue
        if s.endswith("\\"):
            cur += s[:-1] + " "
            continue
        out.append((cur + s).strip())
        cur = ""
    if cur:
        out.append(cur.strip())
    return [l for l in out if l]


@pytest.mark.parametrize("name", CONTAINERFILES)
def test_copy_sources_exist(name):
    for line in _lines(DEPLOY / name):
        if not line.startswith("COPY "):
            continue
        parts = line.split()[1:]
        sources = parts[:-1]  # last operand is the destination
        for src in sources:
            assert (REPO / src).exists(), (
                f"{name}: COPY source {src!r} missing from the repo")


@pytest.mark.parametrize("name", CONTAINERFILES)
def test_cmd_uses_packaged_entrypoint(name):
    lines = _lines(DEPLOY / name)
    cmds = [l for l in lines if l.startswith("CMD")]
    assert len(cmds) == 1
    assert "ncf-tpu " in cmds[0]
    # the console script must really be declared in pyproject.toml
    pyproject = (REPO / "pyproject.toml").read_text()
    assert re.search(r'^ncf-tpu\s*=\s*"ncf_tpu\.cli:main"',
                     pyproject, re.M), "ncf-tpu console script missing"
    # Parse the CMD's argv against the real CLI parser so an invalid
    # flag (e.g. a nonexistent --set) fails here, not at container
    # start (ADVICE r2: Containerfiles shipped `--set` which the CLI
    # rejects — this test now catches that class of bug).
    import shlex

    from ncf_tpu import cli

    argv_str = cmds[0].removeprefix("CMD").strip()
    # resolve the shell-form env expansions with dummy values
    argv_str = re.sub(r"\$\{(\w+):\+([^}]*)\}", "", argv_str)
    argv_str = re.sub(r"\$\{?(\w+)\}?", "X", argv_str)
    argv = shlex.split(argv_str)
    assert argv[0] == "ncf-tpu"
    parser = cli.build_parser()
    args = parser.parse_args(argv[1:])  # raises SystemExit on bad flags
    for ov in args.overrides or []:
        assert re.match(r"^[\w.]+=", ov), f"malformed override {ov!r}"


@pytest.mark.parametrize("name", CONTAINERFILES)
def test_env_config_defaults_exist(name):
    for line in _lines(DEPLOY / name):
        m = re.match(r"ENV\s+NCF_CONFIG=(\S+)", line)
        if m:
            rel = m.group(1).removeprefix("/app/")
            assert (REPO / rel).exists(), (
                f"{name}: default NCF_CONFIG {m.group(1)} not in the repo")
            break
    else:
        pytest.fail(f"{name}: no NCF_CONFIG default")


def test_api_healthcheck_route_matches():
    """The HEALTHCHECK must probe the route the server actually serves."""
    text = (DEPLOY / "Containerfile.api").read_text()
    assert "/health" in text
    app_src = (REPO / "ncf_tpu" / "api" / "app.py").read_text()
    assert '"/health"' in app_src


def test_cli_subcommands_exist():
    """Every CMD subcommand (serve/train) is a registered CLI command."""
    from ncf_tpu import cli
    parser = cli.build_parser()
    sub = next(a for a in parser._actions
               if a.__class__.__name__ == "_SubParsersAction")
    for name in ("serve", "train"):
        assert name in sub.choices


def test_serving_redis_url_reaches_feature_cache(monkeypatch):
    """serving.redis_url (wired by the API container's NCF_REDIS_URL)
    must flow into the default FeatureCache the API builds."""
    from ncf_tpu.api import app as app_mod
    from ncf_tpu.utils.config import Config

    seen = {}

    class _SpyCache:
        def __init__(self, feature_ttl_s=None, embedding_ttl_s=None,
                     redis_url=None, **kw):
            seen.update(feature_ttl_s=feature_ttl_s,
                        embedding_ttl_s=embedding_ttl_s,
                        redis_url=redis_url)

    cfg = Config()
    cfg.serving.redis_url = "redis://example:6379/0"
    cfg.serving.cache_feature_ttl_s = 123
    cfg.serving.cache_embedding_ttl_s = 456

    class _StubServer:
        pass

    stub = _StubServer()
    stub.cfg = cfg
    monkeypatch.setattr(app_mod, "FeatureCache", _SpyCache)
    app_mod.RecommendationAPI(stub)
    assert seen == {"feature_ttl_s": 123, "embedding_ttl_s": 456,
                    "redis_url": "redis://example:6379/0"}


def test_compose_references_real_paths():
    text = (DEPLOY / "compose.yaml").read_text()
    m = re.search(r"dockerfile:\s*(\S+)", text)
    assert m and (REPO / m.group(1)).exists()
