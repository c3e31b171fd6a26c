"""Generate tiny committed data fixtures in the EXACT reference corpus schemas.

Run from the repo root:  python tests/fixtures/gen_fixtures.py

Schemas reproduced (see stgcma_tpu/data/datasets.py for file:line citations):
  AVE  — {train,test}_order.h5 'order' (indices), labels.h5 'avadataset'
         one-hot [N,10,29], Annotations.txt '&'-separated (header row counts
         as row 0, like pd.read_csv(header=None)), video_frames/<vid>/%04d.jpg,
         raw_audio/<vid>.wav
  AVQA — avqa-{train,test}.json (video_id/question_id/question_content/
         templ_values/anser/type), frames/<vid>/%08d.jpg, audio_wav/<vid>.wav
  AVS  — s4_meta_data.csv (name,split,category), visual_frames/<split>/<cat>/
         <name>/<name>_%d.png, gt_masks/... (1 train / 5 test masks, mode '1'),
         audio_wav/<split>/<cat>/<name>.wav
"""
import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SR = 2000          # tiny sample rate keeps wav fixtures small
IMG = 32


def write_wav(path, seconds, seed):
    from scipy.io import wavfile
    rng = np.random.RandomState(seed)
    data = (rng.randn(int(SR * seconds)) * 3000).astype(np.int16)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    wavfile.write(path, SR, data)


def write_jpg(path, seed):
    from PIL import Image
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(rng.randint(0, 256, (IMG, IMG, 3), np.uint8)).save(path)


def write_mask_png(path, seed):
    from PIL import Image
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(rng.rand(IMG, IMG) > 0.5).save(path)


def gen_ave(root):
    import h5py
    vids = ["fx_a1b2", "fx_c3d4", "fx_e5f6"]
    # Annotations.txt: header + one row per video (order indexes rows
    # INCLUDING the header, mirroring pd.read_csv(header=None))
    with open(os.path.join(root, "Annotations.txt"), "w") as f:
        f.write("Category&VideoID&Quality&StartTime&EndTime\n")
        for v in vids:
            f.write(f"Church bell&{v}&good&0&10\n")
    with h5py.File(os.path.join(root, "train_order.h5"), "w") as f:
        f.create_dataset("order", data=np.asarray([1, 2], np.int64))
    with h5py.File(os.path.join(root, "test_order.h5"), "w") as f:
        f.create_dataset("order", data=np.asarray([3], np.int64))
    rng = np.random.RandomState(0)
    labels = np.zeros((4, 10, 29), np.float32)
    for i in range(4):
        labels[i, np.arange(10), rng.randint(0, 29, 10)] = 1.0
    with h5py.File(os.path.join(root, "labels.h5"), "w") as f:
        f.create_dataset("avadataset", data=labels)
    for vi, v in enumerate(vids):
        for k in range(1, 13):  # 12 frames, %04d from 1 (AVE/dataloader.py:299)
            write_jpg(os.path.join(root, "video_frames", v, f"{k:04d}.jpg"),
                      seed=vi * 100 + k)
        write_wav(os.path.join(root, "raw_audio", v + ".wav"), 2.5, seed=vi)


def gen_avqa(root):
    vids = ["fxq_00001", "fxq_00002"]
    samples = []
    qc = ["How many <Object> are in the video?",
          "Is the <Object> making sound?"]
    tv = ["['dog']", "['cat']"]
    ans = ["two", "yes"]
    qid = 0
    for v in vids:
        for j in range(2):
            samples.append({"video_id": v, "question_id": qid,
                            "question_content": qc[j], "templ_values": tv[j],
                            "anser": ans[j], "type": "['Audio', 'Counting']"})
            qid += 1
    with open(os.path.join(root, "avqa-train.json"), "w") as f:
        json.dump(samples, f)
    with open(os.path.join(root, "avqa-test.json"), "w") as f:
        json.dump(samples[:2], f)
    for vi, v in enumerate(vids):
        for k in range(1, 13):  # %08d from 1 (AVQA/dataloader.py:186)
            write_jpg(os.path.join(root, "frames", v, f"{k:08d}.jpg"),
                      seed=vi * 100 + k)
        write_wav(os.path.join(root, "audio_wav", v + ".wav"), 3.0, seed=10 + vi)


def gen_avs(root):
    rows = [("fxs_bell", "train", "playing_handbell"),
            ("fxs_dog", "train", "dog_barking"),
            ("fxs_cat", "test", "cat_meowing")]
    with open(os.path.join(root, "s4_meta_data.csv"), "w") as f:
        f.write("name,split,category\n")
        for name, split, cat in rows:
            f.write(f"{name},{split},{cat}\n")
    for ri, (name, split, cat) in enumerate(rows):
        for k in range(1, 6):  # <name>_%d.png (AVS/dataloader.py:168)
            write_jpg(os.path.join(root, "visual_frames", split, cat, name,
                                   f"{name}_{k}.png"), seed=ri * 100 + k)
        n_masks = 1 if split == "train" else 5
        for k in range(1, n_masks + 1):
            write_mask_png(os.path.join(root, "gt_masks", split, cat, name,
                                        f"{name}_{k}.png"), seed=ri * 100 + k)
        write_wav(os.path.join(root, "audio_wav", split, cat, name + ".wav"),
                  3.0, seed=20 + ri)


def gen_avs_ms3(root):
    """MS3 schema: ms3_meta_data.csv has NO category column (multi-source
    clips are uncategorized — AVS/preprocess/preprocess_ms3.py stores frames
    without the per-category directory level)."""
    rows = [("fxm_duo", "train"), ("fxm_band", "train"), ("fxm_trio", "test")]
    with open(os.path.join(root, "ms3_meta_data.csv"), "w") as f:
        f.write("name,split\n")
        for name, split in rows:
            f.write(f"{name},{split}\n")
    for ri, (name, split) in enumerate(rows):
        for k in range(1, 6):
            write_jpg(os.path.join(root, "visual_frames", split, name,
                                   f"{name}_{k}.png"), seed=500 + ri * 100 + k)
        n_masks = 1 if split == "train" else 5
        for k in range(1, n_masks + 1):
            write_mask_png(os.path.join(root, "gt_masks", split, name,
                                        f"{name}_{k}.png"),
                           seed=500 + ri * 100 + k)
        write_wav(os.path.join(root, "audio_wav", split, name + ".wav"),
                  3.0, seed=60 + ri)


def main():
    for sub, gen in (("ave", gen_ave), ("avqa", gen_avqa), ("avs", gen_avs),
                     ("avs_ms3", gen_avs_ms3)):
        root = os.path.join(HERE, sub)
        os.makedirs(root, exist_ok=True)
        gen(root)
    print("fixtures written under", HERE)


if __name__ == "__main__":
    main()
