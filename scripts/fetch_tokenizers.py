"""Fetch tokenizer assets for the model-config zoo (weights-bearing
environments only — this build environment has zero egress).

The reference ships tokenizer files inside its models/ zoo
(/root/reference/models/llama-2-7b/tokenizer.model); ours cannot vendor
them (license-encumbered + no egress), so this script downloads them
from the upstream HF repos into models/<dir>/ next to each config.json.

Usage:
  python scripts/fetch_tokenizers.py [dir ...]     # default: every dir
  python scripts/fetch_tokenizers.py llama-2-7b vicuna-13b-v1.3
"""

import os
import sys

# family dir -> (HF repo id, files). LLaMA-family dirs all use the
# sentencepiece model; any same-vocab repo works — gated repos may need
# HF_TOKEN in the environment.
_SOURCES = {
    "llama-7b": ("huggyllama/llama-7b", ["tokenizer.model"]),
    "llama-13b": ("huggyllama/llama-13b", ["tokenizer.model"]),
    "llama-30b": ("huggyllama/llama-30b", ["tokenizer.model"]),
    "llama-65b": ("huggyllama/llama-65b", ["tokenizer.model"]),
    "llama-2-7b": ("meta-llama/Llama-2-7b-hf", ["tokenizer.model"]),
    "llama-2-13b": ("meta-llama/Llama-2-13b-hf", ["tokenizer.model"]),
    "vicuna-7b-v1.1": ("lmsys/vicuna-7b-v1.1", ["tokenizer.model"]),
    "vicuna-13b-v1.1": ("lmsys/vicuna-13b-v1.1", ["tokenizer.model"]),
    "vicuna-7b-v1.3": ("lmsys/vicuna-7b-v1.3", ["tokenizer.model"]),
    "vicuna-13b-v1.3": ("lmsys/vicuna-13b-v1.3", ["tokenizer.model"]),
    "mistral-7b": ("mistralai/Mistral-7B-v0.1", ["tokenizer.model"]),
    "opt-1.3b": ("facebook/opt-1.3b", ["vocab.json", "merges.txt"]),
    "opt-2.7b": ("facebook/opt-2.7b", ["vocab.json", "merges.txt"]),
    "opt-6.7b": ("facebook/opt-6.7b", ["vocab.json", "merges.txt"]),
    "opt-13b": ("facebook/opt-13b", ["vocab.json", "merges.txt"]),
    "opt-30b": ("facebook/opt-30b", ["vocab.json", "merges.txt"]),
    # xgen uses the in-tree tiktoken-style tokenizer; it only needs the
    # public gpt2 tiktoken table if tiktoken's own cache is absent
    "xgen-7b-8k-base": ("Salesforce/xgen-7b-8k-base", []),
    "xgen-7b-8k-inst": ("Salesforce/xgen-7b-8k-inst", []),
}


def main():
    try:
        from huggingface_hub import hf_hub_download
    except ImportError:
        print("huggingface_hub is not installed — run this in a "
              "weights-bearing environment (pip install huggingface_hub)",
              file=sys.stderr)
        return 1
    zoo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "models")
    want = sys.argv[1:] or sorted(
        d for d in os.listdir(zoo)
        if os.path.isdir(os.path.join(zoo, d)))
    rc = 0
    for d in want:
        src = _SOURCES.get(d)
        if src is None:
            print(f"{d}: no upstream source mapped — skipping")
            continue
        repo, files = src
        if not files:
            print(f"{d}: no assets needed (in-tree tokenizer)")
            continue
        for f in files:
            dst = os.path.join(zoo, d, f)
            if os.path.exists(dst):
                print(f"{d}/{f}: already present")
                continue
            try:
                p = hf_hub_download(repo_id=repo, filename=f)
            except Exception as e:  # gated repo / no network
                print(f"{d}/{f}: FAILED from {repo}: {e}", file=sys.stderr)
                rc = 1
                continue
            import shutil

            shutil.copyfile(p, dst)
            print(f"{d}/{f}: fetched from {repo}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
