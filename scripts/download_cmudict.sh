#!/bin/bash
# Fetches the CMU pronouncing dictionary into ./data (counterpart of
# reference scripts/download_cmudict.sh).
set -e
mkdir -p data
curl -L -o data/cmudict.dict \
    https://raw.githubusercontent.com/cmusphinx/cmudict/master/cmudict.dict
