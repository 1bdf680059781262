#!/bin/bash
# Fetches LJSpeech 1.1 into ./data (counterpart of reference
# scripts/download_ljspeech.sh). In network-restricted environments use
# scripts/make_synth_dataset.py to fabricate a development corpus instead.
set -e
mkdir -p data
cd data
curl -LO https://data.keithito.com/data/speech/LJSpeech-1.1.tar.bz2
tar -xjf LJSpeech-1.1.tar.bz2
rm LJSpeech-1.1.tar.bz2
