#!/usr/bin/env bash
# COCO-Stuff 15 unseen categories (paper Table 1; reference coco_unseen.sh).
cd "$(dirname "$0")/../.."

data_dir=${data_dir:-./dataset/coco}
export data=${data_dir}/unseen_val2017.tsv,${data_dir}/unseen_val2017.tsv
export num_seg_tokens=15
export category_list='frisbee, skateboard, cardboard, carrot, scissors, suitcase, giraffe, cow, road, concrete wall, tree, grass, river, clouds, playingfield'
export session_name=coco_unseen

source run_scripts/IFSeg/common.sh "$@"
