from ihgnn_tpu.data.preprocess.text import TextPreprocessor, reverse_lookup
