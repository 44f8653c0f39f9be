#!/usr/bin/env bash
# Shared launcher for the IFSeg experiments (TPU-native).
#
# Mirrors the reference run_scripts/IFSeg/*.sh flag-for-flag; the reference's
# torch.distributed.launch 4-GPU setup becomes a single-controller JAX process
# over the local TPU mesh (data_parallel=-1 uses every chip).  The per-GPU
# batch 4 x 4 GPUs = global batch 16 is expressed directly.
#
# Expects: data, num_seg_tokens, category_list, session_name set by caller.
#
# Math parity: the framework's perf default is tanh-gelu (measured at the
# bf16 noise floor vs erf, 100% argmax agreement — README).  These scripts
# are the weights-day parity runs, so they pin the reference's exact erf
# gelu (unify_transformer.py activation default) — the first paper-mIoU
# comparison must not carry an avoidable math variable.  Set PARITY=0 to
# run with the perf default instead.

set -eu

PARITY=${PARITY:-1}
if [ "$PARITY" = "1" ]; then
    activation_fn=gelu
    echo "[parity] --activation-fn=gelu (reference-exact erf; PARITY=0 for the tanh perf default)"
else
    activation_fn=gelu_tanh
fi

bpe_dir=${bpe_dir:-./assets/BPE}
log_root=${log_root:-./experiment_outputs}
save_path=${log_root}/${session_name}
mkdir -p "$save_path"

batch_size=${batch_size:-16}        # global (reference: 4 GPUs x 4)
update_freq=${update_freq:-1}
patch_image_size=${patch_image_size:-512}
lr=${lr:-5.0e-5}
wd=${wd:-0.1}
max_epoch=${max_epoch:-20}
epoch_row_count=${epoch_row_count:-1600}
restore_file=${restore_file:-ofa_base.pt}
arch=${arch:-segofa_base}

python -m ifseg_tpu.cli.train \
    "$data" \
    --selected-cols=0,1,2 \
    --bpe-dir="${bpe_dir}" \
    --restore-file="${restore_file}" \
    --reset-optimizer --reset-dataloader --reset-meters \
    --save-dir="${save_path}" \
    --arch="${arch}" \
    --num-seg-tokens="${num_seg_tokens}" \
    --category-list="${category_list}" \
    --prompt-prefix='what is the segmentation map of the image? object:' \
    --artificial-image-type=rand_k-1-33 \
    --unsupervised-segmentation=true \
    --batch-size="${batch_size}" \
    --batch-size-valid=1 \
    --update-freq="${update_freq}" \
    --criterion-update-freq="${update_freq}" \
    --patch-image-size="${patch_image_size}" \
    --orig-patch-image-size="${patch_image_size}" \
    --label-smoothing=0.0 \
    --freeze-encoder-embedding=true --freeze-decoder-embedding=true \
    --freeze-seg-embedding=true --freeze-entire-resnet=true \
    --resnet-drop-path-rate=0.0 \
    --encoder-drop-path-rate=0.1 \
    --decoder-drop-path-rate=0.1 \
    --dropout=0.1 --attention-dropout=0.0 \
    --weight-decay="${wd}" --adam-betas='(0.9,0.999)' --adam-eps=1e-08 \
    --clip-norm=1.0 \
    --lr-scheduler=cosine --lr="${lr}" --warmup-ratio=0.0 \
    --max-epoch="${max_epoch}" \
    --epoch-row-count="${epoch_row_count}" \
    --fixed-validation-seed=7 --seed=7 \
    --keep-best-checkpoints=1 --keep-last-epochs=1 \
    --save-interval=1 --validate-interval=1 \
    --best-checkpoint-metric=mIoU --maximize-best-checkpoint-metric \
    --max-src-length=80 --max-tgt-length=20 \
    --tie-seg-projection=true --init-seg-with-text=true \
    --decoder-type=surrogate --decoder-input-type=encoder_output \
    --full-context-alignment=false \
    --activation-fn="${activation_fn}" \
    --resnet-topk=3 --resnet-iters=25 \
    --log-format=simple --log-interval=10 \
    "$@"
