#!/bin/bash
# Watch r4_chain.log for the char stage's completion; then stop the
# original chain (which would start AR-rec next) and hand off to
# r4_chain2.sh (CTC-first order). Polls every 30 s.
cd /root/repo
while true; do
  if grep -q '"char"' runs/r4_chain.log 2>/dev/null; then
    echo "char stage finished ($(date)); swapping chains"
    # kill the chain's whole process group (the bash + any in-flight
    # python it just spawned) by recorded PID — never by pattern
    CPID=$(cat /tmp/r4chain.pid)
    PGID=$(ps -o pgid= -p "$CPID" | tr -d ' ')
    if [ -n "$PGID" ]; then kill -- "-$PGID" 2>/dev/null; else kill "$CPID" 2>/dev/null; fi
    sleep 10
    # kill any in-flight rec python started by the old chain
    if [ -f runs/production_v5/runs/recognize/rec/args.yaml ]; then
      echo "note: rec already started; its partial run dir stays for resume"
    fi
    nohup bash r4_chain2.sh > runs/r4_chain2.log 2>&1 &
    echo $! > /tmp/r4chain2.pid
    echo "chain2 launched pid $(cat /tmp/r4chain2.pid)"
    break
  fi
  sleep 30
done
