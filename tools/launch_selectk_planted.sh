#!/bin/bash
# Detached launcher for the planted K-grid experiment (see memory: the Bash
# tool's timeout kills foreground runs; setsid+nohup survives).
cd /root/repo
exec bash tools/run_main.sh graft.RunSelectKPlanted "$@"
