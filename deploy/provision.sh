#!/usr/bin/env sh
# Ordered environment bring-up — the reference's `setup_all.sh` +
# `terraform apply` + `validate_setup.py` sequence (reference
# scripts/0. setup/, terraform/main.tf:22-120) as one idempotent
# kubectl flow against any cluster.
#
#   sh deploy/provision.sh [--with-train]
#
# Order matters the same way the reference's depends_on chains do:
# network/identity first, state next, services last, validate at the end.
set -eu

NS=ncf-tpu
HERE=$(dirname "$0")

echo "[1/5] provisioning: namespace, RBAC, quota, network policies"
kubectl apply -f "$HERE/k8s/provision.yaml"

echo "[2/5] storage: checkpoint volume"
kubectl apply -n "$NS" -f "$HERE/k8s/storage.yaml"

echo "[3/5] cache: redis (Memorystore analogue)"
kubectl apply -n "$NS" -f "$HERE/k8s/redis.yaml"

echo "[4/5] serving: API deployment + service + HPA"
kubectl apply -n "$NS" -f "$HERE/k8s/api.yaml"
kubectl -n "$NS" rollout status deployment/ncf-tpu-api --timeout=300s

if [ "${1:-}" = "--with-train" ]; then
  echo "[4b] training job"
  kubectl apply -n "$NS" -f "$HERE/k8s/train-job.yaml"
fi

echo "[5/5] validate (the validate_setup.py analogue): ncf-tpu doctor"
# run inside an API pod so the check sees the runtime environment
POD=$(kubectl -n "$NS" get pods -l app=ncf-tpu-api \
      -o jsonpath='{.items[0].metadata.name}')
kubectl -n "$NS" exec "$POD" -- ncf-tpu doctor || {
  echo "doctor reported failures" >&2
  exit 1
}
echo "provisioned: namespace $NS healthy"
