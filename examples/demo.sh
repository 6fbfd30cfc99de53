#!/usr/bin/env bash
# End-to-end demo of the vectordb-tpu HTTP API (parity with the reference's
# examples/demo.sh: exercises all 9 endpoints including filtered search,
# batch operations, delete, and metrics).
set -euo pipefail

ADDR="${ADDR:-127.0.0.1:3789}"
BASE="http://$ADDR"
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"

pretty() { python3 -m json.tool 2>/dev/null || cat; }

echo "=== starting server on $ADDR ==="
PYTHONPATH="$REPO_DIR:${PYTHONPATH:-}" python3 -m vectordb_tpu serve --addr "$ADDR" &
SERVER_PID=$!
trap 'kill $SERVER_PID 2>/dev/null || true' EXIT

for i in $(seq 1 60); do
  curl -sf "$BASE/health" >/dev/null 2>&1 && break
  sleep 0.5
done
curl -sf "$BASE/health" >/dev/null || { echo "server did not come up"; exit 1; }

echo; echo "=== 1. POST /vectors — insert with metadata ==="
curl -s -X POST "$BASE/vectors" -H 'Content-Type: application/json' \
  -d '{"id": "doc1", "vector": [1.0, 0.0, 0.0], "metadata": {"category": "intro", "lang": "en"}}' | pretty
curl -s -X POST "$BASE/vectors" -H 'Content-Type: application/json' \
  -d '{"id": "doc2", "vector": [0.0, 1.0, 0.0], "metadata": {"category": "body", "lang": "en"}}' | pretty
curl -s -X POST "$BASE/vectors" -H 'Content-Type: application/json' \
  -d '{"id": "doc3", "vector": [0.0, 0.0, 1.0], "metadata": {"category": "intro", "lang": "fr"}}' | pretty

echo; echo "=== 2. POST /vectors/batch — bulk insert ==="
curl -s -X POST "$BASE/vectors/batch" -H 'Content-Type: application/json' \
  -d '{"vectors": [
        {"id": "bulk1", "vector": [0.9, 0.1, 0.0]},
        {"id": "bulk2", "vector": [0.1, 0.9, 0.0], "metadata": {"category": "body"}}
      ]}' | pretty

echo; echo "=== 3. GET /vectors — list IDs ==="
curl -s "$BASE/vectors" | pretty

echo; echo "=== 4. GET /vectors/doc1 — fetch one ==="
curl -s "$BASE/vectors/doc1" | pretty

echo; echo "=== 5. POST /search — plain k-NN ==="
curl -s -X POST "$BASE/search" -H 'Content-Type: application/json' \
  -d '{"vector": [1.0, 0.05, 0.0], "k": 3}' | pretty

echo; echo "=== 6. POST /search — filtered (category=intro AND lang exists) ==="
curl -s -X POST "$BASE/search" -H 'Content-Type: application/json' \
  -d '{"vector": [1.0, 0.05, 0.0], "k": 3,
       "filter": {"op": "and", "filters": [
         {"op": "eq", "field": "category", "value": "intro"},
         {"op": "exists", "field": "lang"}]}}' | pretty

echo; echo "=== 6b. POST /search — radius (range) query, beyond the reference ==="
curl -s -X POST "$BASE/search" -H 'Content-Type: application/json' \
  -d '{"vector": [1.0, 0.05, 0.0], "radius": 0.5, "limit": 10}' | pretty

echo; echo "=== 7. POST /search/batch — batched queries ==="
curl -s -X POST "$BASE/search/batch" -H 'Content-Type: application/json' \
  -d '{"queries": [{"vector": [1.0, 0.0, 0.0], "k": 2},
                   {"vector": [0.0, 1.0, 0.0], "k": 2}]}' | pretty

echo; echo "=== 8. DELETE /vectors/doc3 ==="
curl -s -X DELETE "$BASE/vectors/doc3" | pretty
echo "get after delete (expect 404 error):"
curl -s "$BASE/vectors/doc3" | pretty

echo; echo "=== 9. GET /health and GET /metrics ==="
curl -s "$BASE/health" | pretty
curl -s "$BASE/metrics" | pretty

kill $SERVER_PID 2>/dev/null || true
wait $SERVER_PID 2>/dev/null || true

echo; echo "=== 10. recall knob x filter (HNSW server), beyond the reference ==="
ADDR2="${ADDR2:-127.0.0.1:3790}"
BASE2="http://$ADDR2"
PYTHONPATH="$REPO_DIR:${PYTHONPATH:-}" python3 -m vectordb_tpu --index hnsw serve --addr "$ADDR2" &
SERVER_PID=$!
trap 'kill $SERVER_PID 2>/dev/null || true' EXIT
for i in $(seq 1 60); do
  curl -sf "$BASE2/health" >/dev/null 2>&1 && break
  sleep 0.5
done
curl -sf "$BASE2/health" >/dev/null || { echo "hnsw server did not come up"; exit 1; }
for i in $(seq 0 19); do
  cat=$([ $((i % 2)) -eq 0 ] && echo even || echo odd)
  curl -s -X POST "$BASE2/vectors" -H 'Content-Type: application/json' \
    -d "{\"id\": \"p$i\", \"vector\": [$i.0, 1.0], \"metadata\": {\"parity\": \"$cat\"}}" >/dev/null
done
echo "ef=64 + parity=odd filter (graph traversal rides the mask):"
curl -s -X POST "$BASE2/search" -H 'Content-Type: application/json' \
  -d '{"vector": [6.1, 1.0], "k": 3, "ef": 64,
       "filter": {"op": "eq", "field": "parity", "value": "odd"}}' | pretty

echo; echo "=== demo complete ==="
