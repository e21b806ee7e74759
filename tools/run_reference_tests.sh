#!/bin/sh
# Validate tools/ref_shims by running the REFERENCE's own unit tests
# under them (dependency-free subset: mappers whose hard deps are the
# shimmed utility libs only).  29/29 in-scope tests pass; excluded
# modules need datasets/transformers/tokenizers/blingfire or the real
# ftfy/glom (their mappers are also excluded from baseline_measure).
set -e
d=$(mktemp -d)
cd /root/reference/tests
for f in test_*.py; do
  case $f in
    test_glom.py|test_s3.py|test_io_utils.py|test_batch_interface.py|\
    test_caching.py|test_hf_pickling.py|test_types.py|test_collators.py|\
    test_decoding.py|test_drop_fields.py|test_prompting.py|\
    test_promptsource.py|test_promptsource_recipe.py|\
    test_tokenize_mappers.py|test_text.py|test_text2words.py|\
    test_loaders.py) ;;
    *) cp "$f" "$d/";;
  esac
done
cp -r fixtures "$d/" 2>/dev/null || true
cd "$d"
PYTHONPATH=/root/repo/tools/ref_shims:/root/reference/src python -m pytest . -q
