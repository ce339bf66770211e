#!/bin/bash
# Poll the warm sbt tmux pane until the current command finishes (prompt
# reappears after a "Total time" line). Prints the last relevant output.
# Usage: tools/waitsbt.sh [timeout_seconds]
T=${1:-600}
for i in $(seq 1 $((T/5))); do
  sleep 5
  last=$(tmux capture-pane -t sbt -p -S -2000 | grep -v '^$' | tail -1)
  case "$last" in
    *'sbt:infofarmsparkmlspark>'*) break ;;
  esac
done
tmux capture-pane -t sbt -p -S -2000 | grep -v '^$' | awk '/runMain|testOnly|^sbt.*> (test|compile)/{n=NR} {l[NR]=$0} END{for(i=n;i<=NR;i++) print l[i]}' | tail -40
