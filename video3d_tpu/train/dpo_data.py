"""DPO preference-pair data path.

Record schema (reference train_dpo.py + vendored trl DPODataCollator):
  {"video": scene_id, "prompt": question text, "chosen": preferred answer,
   "rejected": dispreferred answer, ...}
Each record expands to two supervised conversations sharing the prompt; the
existing Collator builds a static-shape Batch for each side.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

from video3d_tpu.constants import DEFAULT_IMAGE_TOKEN


def dpo_record_to_conversations(record: Dict[str, Any]) -> Tuple[list, list]:
    prompt = record["prompt"]
    if DEFAULT_IMAGE_TOKEN not in prompt and "video" in record:
        prompt = f"{DEFAULT_IMAGE_TOKEN}\n{prompt}"
    chosen = [{"from": "human", "value": prompt},
              {"from": "gpt", "value": record["chosen"]}]
    rejected = [{"from": "human", "value": prompt},
                {"from": "gpt", "value": record["rejected"]}]
    return chosen, rejected


class DPODataset:
    """Wraps a SupervisedDataset-style pipeline for preference pairs."""

    def __init__(self, records: Sequence[dict], tokenizer, video_processor,
                 image_processor, frames_upbound: int = 32):
        self.records = list(records)
        self.tokenizer = tokenizer
        self.vp = video_processor
        self.ip = image_processor
        self.frames_upbound = frames_upbound

    def __len__(self):
        return len(self.records)

    def __getitem__(self, i: int) -> Tuple[Dict, Dict]:
        from video3d_tpu.data.tokenization import preprocess_qwen

        rec = self.records[i]
        chosen_conv, rejected_conv = dpo_record_to_conversations(rec)

        video = {}
        if "video" in rec:
            vd = self.vp.process_3d_video(rec["video"], self.ip,
                                          force_sample=True,
                                          frames_upbound=self.frames_upbound)
            video = {"images": vd["images"], "world_coords": vd["world_coords"],
                     "objects": vd["objects"], "video_size": vd["video_size"]}

        out = []
        for conv in (chosen_conv, rejected_conv):
            tok = preprocess_qwen([conv], self.tokenizer,
                                  has_image="video" in rec)
            sample = {"input_ids": tok["input_ids"][0],
                      "labels": tok["labels"][0],
                      "id": rec.get("id", i), "dataset": "dpo", **video}
            out.append(sample)
        return out[0], out[1]


class DPOCollator:
    """(chosen, rejected) sample pairs -> two static Batch array dicts."""

    def __init__(self, collator):
        self.collator = collator

    def __call__(self, pairs: Sequence[Tuple[Dict, Dict]]):
        chosen = self.collator([p[0] for p in pairs])
        rejected = self.collator([p[1] for p in pairs])
        return chosen, rejected
