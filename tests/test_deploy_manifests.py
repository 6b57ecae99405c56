"""Declarative deployment manifests (deploy/k8s/*.yaml) linted against
the real CLI / config / API surface — the validation pattern of
tests/test_deploy_packaging.py extended to the k8s manifests (round-4
verdict item 5; reference analogue terraform/main.tf:22-120).

No cluster exists here, so the tests assert the manifests are
*internally consistent with this repo*: env vars point at baked files,
probe paths are real API routes, commands/overrides parse against the
real CLI and Config, and cross-manifest references (services, volumes,
images) resolve.
"""

from pathlib import Path

import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent
K8S = REPO / "deploy" / "k8s"

MANIFEST_FILES = ["api.yaml", "redis.yaml", "train-job.yaml", "storage.yaml"]


def _docs():
    docs = []
    for name in MANIFEST_FILES:
        for doc in yaml.safe_load_all((K8S / name).read_text()):
            if doc:
                docs.append((name, doc))
    return docs


DOCS = _docs()


def _by_kind(kind):
    return [(n, d) for n, d in DOCS if d.get("kind") == kind]


def _containers(doc):
    return doc["spec"]["template"]["spec"]["containers"]


def test_all_manifests_parse_and_have_identity():
    assert len(DOCS) >= 6
    for name, doc in DOCS:
        assert doc.get("apiVersion"), f"{name}: missing apiVersion"
        assert doc.get("kind"), f"{name}: missing kind"
        assert doc.get("metadata", {}).get("name"), f"{name}: missing name"


def test_api_env_points_at_baked_files():
    """NCF_CONFIG must name a config the Containerfile actually bakes
    (COPY configs -> /app/configs) and that exists in the repo."""
    (_, dep), = [x for x in _by_kind("Deployment")
                 if x[1]["metadata"]["name"] == "ncf-tpu-api"]
    env = {e["name"]: e.get("value") for e in _containers(dep)[0]["env"]}
    cfg_path = env["NCF_CONFIG"]
    assert cfg_path.startswith("/app/configs/")
    assert (REPO / "configs" / Path(cfg_path).name).is_file()
    assert env["NCF_CHECKPOINT_DIR"] == "/ckpt"
    # the redis URL targets the redis Service by its manifest name
    svc_names = {d["metadata"]["name"] for _, d in _by_kind("Service")}
    host = env["NCF_REDIS_URL"].split("//")[1].split(":")[0]
    assert host in svc_names, f"redis host {host!r} not a declared Service"


def test_probe_paths_are_real_api_routes():
    """Startup/liveness/readiness probes hit routes the API actually
    serves (reference terraform/main.tf:58-66 probes /health)."""
    # the app dispatches on path strings; assert against its source
    src = (REPO / "ncf_tpu" / "api" / "app.py").read_text()
    (_, dep), = [x for x in _by_kind("Deployment")
                 if x[1]["metadata"]["name"] == "ncf-tpu-api"]
    c = _containers(dep)[0]
    for probe in ("startupProbe", "livenessProbe", "readinessProbe"):
        path = c[probe]["httpGet"]["path"]
        assert f'"{path}"' in src or f"'{path}'" in src, (
            f"probe path {path!r} is not a route in api/app.py")


def test_api_probe_schedule_matches_reference():
    """Reference startup probe: 30s initial delay, 10s period, 3
    failures (terraform/main.tf:58-66)."""
    (_, dep), = [x for x in _by_kind("Deployment")
                 if x[1]["metadata"]["name"] == "ncf-tpu-api"]
    sp = _containers(dep)[0]["startupProbe"]
    assert sp["initialDelaySeconds"] == 30
    assert sp["periodSeconds"] == 10
    assert sp["failureThreshold"] == 3


def test_api_resources_match_reference_cloud_run():
    """2 CPU / 2Gi limits (terraform/main.tf:51-56), 1-10 autoscaling
    (main.tf:69-74)."""
    (_, dep), = [x for x in _by_kind("Deployment")
                 if x[1]["metadata"]["name"] == "ncf-tpu-api"]
    limits = _containers(dep)[0]["resources"]["limits"]
    assert limits == {"cpu": "2", "memory": "2Gi"}
    (_, hpa), = _by_kind("HorizontalPodAutoscaler")
    assert hpa["spec"]["minReplicas"] == 1
    assert hpa["spec"]["maxReplicas"] == 10
    assert hpa["spec"]["scaleTargetRef"]["name"] == dep["metadata"]["name"]


def test_train_job_command_parses_against_real_cli():
    """The Job's command is the packaged console script and every dotted
    override is accepted by the real Config."""
    from ncf_tpu.utils.config import Config

    (_, job), = _by_kind("Job")
    c = _containers(job)[0]
    assert c["command"] == ["ncf-tpu"]
    # console script exists in the packaging metadata
    py = (REPO / "pyproject.toml").read_text()
    assert "ncf-tpu" in py and "ncf_tpu.cli" in py
    args = c["args"]
    assert args[0] == "train"
    # --config names a baked config that exists
    cfg_idx = args.index("--config")
    cfg_file = Path(args[cfg_idx + 1]).name
    assert (REPO / "configs" / cfg_file).is_file()
    overrides = [a for a in args if "=" in a and not a.startswith("--")]
    assert overrides, "job should pin checkpoint/metrics outputs"
    cfg = Config.from_yaml(str(REPO / "configs" / cfg_file))
    cfg.apply_overrides(overrides)          # raises on unknown keys
    assert cfg.train.checkpoint_dir == "/out/ckpt"
    assert cfg.mesh.enable in ("auto", "on")


def test_train_job_retry_and_timeout_match_reference():
    """Vertex job policy: max_retry_count 3, timeout 24h
    (reference config/config.yaml:48-50)."""
    (_, job), = _by_kind("Job")
    assert job["spec"]["backoffLimit"] == 3
    assert job["spec"]["activeDeadlineSeconds"] == 24 * 3600


def test_volume_claims_resolve():
    """Every PVC referenced by a pod spec is declared."""
    declared = {d["metadata"]["name"]
                for _, d in _by_kind("PersistentVolumeClaim")}
    for _, doc in DOCS:
        if doc["kind"] not in ("Deployment", "Job"):
            continue
        pod = doc["spec"]["template"]["spec"]
        for vol in pod.get("volumes", []):
            pvc = vol.get("persistentVolumeClaim")
            if pvc:
                assert pvc["claimName"] in declared, (
                    f"{doc['metadata']['name']}: undeclared PVC "
                    f"{pvc['claimName']!r}")


def test_images_reference_containerfile_builds():
    """Deployment/Job images are the names the Containerfiles build (or
    upstream library images)."""
    allowed_prefixes = ("ncf-tpu-api", "ncf-tpu-train", "redis:")
    for _, doc in DOCS:
        if doc["kind"] not in ("Deployment", "Job"):
            continue
        for c in _containers(doc):
            assert c["image"].startswith(allowed_prefixes), c["image"]


def test_service_selectors_match_pod_labels():
    deployments = {d["metadata"]["name"]: d for _, d in _by_kind("Deployment")}
    for _, svc in _by_kind("Service"):
        sel = svc["spec"]["selector"]
        match = [
            d for d in deployments.values()
            if all(d["spec"]["template"]["metadata"]["labels"].get(k) == v
                   for k, v in sel.items())]
        assert match, (f"service {svc['metadata']['name']} selector {sel} "
                       f"matches no deployment pods")


# ---- provisioning layer (round 5: deploy/k8s/provision.yaml +
# deploy/provision.sh — the reference terraform/setup-scripts analogue,
# terraform/main.tf:22-120, scripts/0. setup/)

PROVISION = K8S / "provision.yaml"
PROVISION_SH = REPO / "deploy" / "provision.sh"


def _prov_docs():
    return [d for d in yaml.safe_load_all(PROVISION.read_text()) if d]


def test_provision_parses_and_is_namespaced():
    docs = _prov_docs()
    kinds = {d["kind"] for d in docs}
    assert {"Namespace", "ServiceAccount", "Role", "RoleBinding",
            "ResourceQuota", "NetworkPolicy"} <= kinds
    for d in docs:
        if d["kind"] != "Namespace":
            assert d["metadata"].get("namespace") == "ncf-tpu", d["kind"]


def test_provision_service_account_is_used_by_workloads():
    sa = [d for d in _prov_docs() if d["kind"] == "ServiceAccount"][0]
    name = sa["metadata"]["name"]
    for _, dep in _by_kind("Deployment") + _by_kind("Job"):
        if dep["metadata"]["name"].startswith("ncf-tpu-redis"):
            continue  # redis runs with the namespace default SA
        spec = dep["spec"]["template"]["spec"]
        assert spec.get("serviceAccountName") == name, dep["metadata"]["name"]
    # and the RoleBinding binds that SA to the namespace Role
    rb = [d for d in _prov_docs() if d["kind"] == "RoleBinding"][0]
    assert any(s["name"] == name for s in rb["subjects"])
    role_names = {d["metadata"]["name"] for d in _prov_docs()
                  if d["kind"] == "Role"}
    assert rb["roleRef"]["name"] in role_names


def test_network_policies_match_real_ports_and_labels():
    pols = [d for d in _prov_docs() if d["kind"] == "NetworkPolicy"]
    by_name = {d["metadata"]["name"]: d for d in pols}

    # real pod labels from the workload manifests
    labels = {}
    for _, dep in _by_kind("Deployment"):
        labels[dep["metadata"]["name"]] = (
            dep["spec"]["template"]["metadata"]["labels"])
    redis_pol = by_name["redis-from-api-only"]
    assert (redis_pol["spec"]["podSelector"]["matchLabels"]
            == labels["ncf-tpu-redis"])
    ingress = redis_pol["spec"]["ingress"][0]
    assert (ingress["from"][0]["podSelector"]["matchLabels"]
            == labels["ncf-tpu-api"])
    # policy port == the redis containerPort
    redis_dep = [d for _, d in _by_kind("Deployment")
                 if d["metadata"]["name"] == "ncf-tpu-redis"][0]
    redis_port = _containers(redis_dep)[0]["ports"][0]["containerPort"]
    assert ingress["ports"][0]["port"] == redis_port

    api_pol = by_name["api-ingress"]
    api_port = _containers(
        [d for _, d in _by_kind("Deployment")
         if d["metadata"]["name"] == "ncf-tpu-api"][0])[0][
        "ports"][0]["containerPort"]
    assert api_pol["spec"]["ingress"][0]["ports"][0]["port"] == api_port


def test_quota_covers_declared_capacity():
    quota = [d for d in _prov_docs() if d["kind"] == "ResourceQuota"][0]
    hard = quota["spec"]["hard"]
    # reference capacity: 10 API instances x 2 CPU (terraform
    # maxScale 10, 2 CPU / 2Gi) + train 4 + redis 1 must fit
    assert float(hard["limits.cpu"]) >= 10 * 2 + 4 + 1
    assert int(hard["pods"]) >= 12


def test_provision_script_applies_existing_files_in_order():
    text = PROVISION_SH.read_text()
    import re

    files = re.findall(r'-f\s+"\$HERE/(k8s/[\w.-]+\.yaml)"', text)
    assert files, "provision.sh applies no manifests?"
    for f in files:
        assert (REPO / "deploy" / f).exists(), f
    # provisioning must come first, serving last
    assert files[0].endswith("provision.yaml")
    assert files.index("k8s/redis.yaml") < files.index("k8s/api.yaml")
    # the validate_setup.py analogue runs at the end
    assert "ncf-tpu doctor" in text
