#!/bin/bash
# Idempotent local-PostgreSQL sidecar for the live-database integration
# spec (dev tool; the container ships the server binaries but no client
# jar — the test-scope wire driver in src/test/scala/graft/pgtest talks
# to it directly). Usage:
#   tools/pg_sidecar.sh            # init (once) + start (if down)
#   SPARK_GRAFT_PG_URL='jdbc:postgresql://localhost:5432/graft?user=graft' \
#     sbt "testOnly graft.PgIntegrationSpec"
set -euo pipefail
DATA=/var/lib/pg/data
id postgres >/dev/null 2>&1 || useradd -m postgres
mkdir -p /var/lib/pg && chown postgres /var/lib/pg
if [ ! -d "$DATA" ]; then
  su postgres -c "cd /tmp && initdb -D $DATA -U graft --auth=trust -E UTF8"
fi
if ! su postgres -c "cd /tmp && pg_ctl -D $DATA status" >/dev/null 2>&1; then
  su postgres -c "cd /tmp && pg_ctl -D $DATA -l /var/lib/pg/server.log \
    -o '-p 5432 -c listen_addresses=localhost -c timezone=UTC' start"
fi
psql -h localhost -p 5432 -U graft -d postgres -tc \
  "SELECT 1 FROM pg_database WHERE datname='graft'" | grep -q 1 ||
  psql -h localhost -p 5432 -U graft -d postgres -c "CREATE DATABASE graft"
echo "postgres ready: jdbc:postgresql://localhost:5432/graft?user=graft"
