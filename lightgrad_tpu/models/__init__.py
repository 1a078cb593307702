from .bert import BertConfig, BertModel, BertForMaskedLM, BertTokenizer
from .gpt import GPTConfig, GPT, GPT2Tokenizer, ByteTokenizer
from .llama import LlamaConfig, Llama, RMSNorm, LlamaTokenizer
from .decoding import (beam_search, generate_batch, generate_speculative,
                       generate_speculative_device)
from .resnet import ResNet, BasicBlock, resnet20, resnet18
from .vit import ViTConfig, ViTModel, ViTForImageClassification
from .diffusion import UNet, Diffusion
from .t5 import T5Config, T5ForConditionalGeneration
from .neox import NeoXConfig, NeoX
