from .chat_manager import ChatManager
from .chat_service import ChatService
from .llm_client import FakeLLM, LLMClient

__all__ = ["ChatManager", "ChatService", "LLMClient", "FakeLLM"]
