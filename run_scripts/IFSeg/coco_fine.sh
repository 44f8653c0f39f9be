#!/usr/bin/env bash
# COCO-Stuff 171 fine categories (paper Table 3; reference coco_fine.sh).
cd "$(dirname "$0")/../.."

data_dir=${data_dir:-./dataset/coco}
export data=${data_dir}/fineseg_refined_val2017.tsv,${data_dir}/fineseg_refined_val2017.tsv
export num_seg_tokens=171
export category_list='person, bicycle, car, motorcycle, airplane, bus, train, truck, boat, traffic light, fire hydrant, stop sign, parking meter, bench, bird, cat, dog, horse, sheep, cow, elephant, bear, zebra, giraffe, backpack, umbrella, handbag, tie, suitcase, frisbee, skis, snowboard, sports ball, kite, baseball bat, baseball glove, skateboard, surfboard, tennis racket, bottle, wine glass, cup, fork, knife, spoon, bowl, banana, apple, sandwich, orange, broccoli, carrot, hot dog, pizza, donut, cake, chair, couch, potted plant, bed, dining table, toilet, tv, laptop, mouse, remote, keyboard, cell phone, microwave, oven, toaster, sink, refrigerator, book, clock, vase, scissors, teddy bear, hair drier, toothbrush, banner, blanket, branch, bridge, building, bush, cabinet, cage, cardboard, carpet, ceiling, ceiling tile, cloth, clothes, clouds, counter, cupboard, curtain, desk, dirt, door, fence, marble floor, other floor, stone floor, tile floor, wood floor, flower, fog, food, fruit, furniture, grass, gravel, ground, hill, house, leaves, light, mat, metal, mirror, moss, mountain, mud, napkin, net, paper, pavement, pillow, plant, plastic, platform, playingfield, railing, railroad, river, road, rock, roof, rug, salad, sand, sea, shelf, sky, skyscraper, snow, solid, stairs, stone, straw, structural, table, tent, textile, towel, tree, vegetable, brick wall, concrete wall, other wall, panel wall, stone wall, tile wall, wood wall, water, waterdrops, blind window, other window, wood'
export session_name=coco_fine

source run_scripts/IFSeg/common.sh "$@"
