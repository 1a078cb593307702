from .bert import BertConfig, BertModel, BertForMaskedLM, BertTokenizer
