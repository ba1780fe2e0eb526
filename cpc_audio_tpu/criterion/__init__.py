from .custom_layers import EqualizedConv1d, EqualizedDense
from .infonce import (BaseCriterion, CPCUnsupervisedCriterion,
                      ModelCriterionCombined, NoneCriterion,
                      sample_negatives, sample_negatives_rolled,
                      stack_positives)
from .prediction import PredictionNetwork
from .seq_alignment import (beam_search, beam_search_py, collapse_label_chain,
                            collapse_label_chain_padded, get_per, get_seq_per,
                            needleman_wunsch_align_score)
from .supervised import CTCPhoneCriterion, PhoneCriterion, SpeakerCriterion

__all__ = [
    "BaseCriterion", "CPCUnsupervisedCriterion", "NoneCriterion",
    "sample_negatives", "sample_negatives_rolled", "stack_positives", "PredictionNetwork",
    "EqualizedConv1d", "EqualizedDense",
    "beam_search", "beam_search_py", "collapse_label_chain",
    "collapse_label_chain_padded", "get_per", "get_seq_per",
    "needleman_wunsch_align_score",
    "CTCPhoneCriterion", "PhoneCriterion", "SpeakerCriterion",
]
